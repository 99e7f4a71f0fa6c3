"""Perceptual analysis over real decoded media (builds on media.py).

``media.py`` proves the codec path: genuine WAV/BMP bytes, decoded
with the Python standard library inside Arrow-batched ``mapInPandas``
stages, with a DuckDB oracle that *predicts* the decode output from
the parametric payload. This module adds the two analyses a training-
data pipeline actually runs on those decoded assets:

- **Perceptual image dedup** (`mm_image_ahash_groups`): the classic
  average-hash (aHash) fingerprint — threshold each pixel of a fixed
  8x8 luma crop against the crop mean, pack the 64 bits, group
  identical hashes. The image corpus is parametric in ``doc_id`` and
  the red channel depends only on ``doc_id % 256``, so genuine
  duplicate-hash groups exist and the oracle derives the exact hash
  of every image without parsing a byte.
- **Audio VAD features** (`mm_audio_vad_features`): zero-crossing
  rate, peak amplitude, and active-sample count — the standard
  voice-activity-detection trio — computed from real ``wave``-decoded
  PCM, with the oracle predicting each count via ``generate_series``
  + ``LAG`` over the closed-form sample stream.

Scale notes: both queries keep payload bytes inside two narrow
``mapInPandas`` stages (encode, decode+featurize); only fixed-width
features (two BIGINT hash halves / four BIGINT counters) ever reach a
shuffle. Image-hash grouping is a single hash aggregate on a 16-byte
key — the exact shape of billion-image dedup jobs; audio features are
shuffle-free per-row extraction. Reference parity: extends the
multimodal mandate (decode/feature-extract as Pandas UDFs) with real
analyses rather than byte statistics.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import BinaryType, LongType, StructField, StructType

from flink_kakfa_spark.registry import query
from flink_kakfa_spark.sources.tables import load_table, parallelize

_PAYLOAD_SCHEMA = StructType(
    [StructField("doc_id", LongType()), StructField("payload", BinaryType())]
)

_WAV_RATE = 8000
_ACTIVE_ABS = 512  # |sample| above this counts as voice-active


@query(
    "mm_image_ahash_groups",
    oracle="""
    WITH px AS (
      SELECT d.doc_id,
             gx.x, gy.y,
             (d.doc_id * gx.x + gy.y) % 256 AS r
      FROM documents d,
           UNNEST(generate_series(0, 7)) AS gx(x),
           UNNEST(generate_series(0, 7)) AS gy(y)
    ),
    stat AS (
      SELECT doc_id, SUM(r) AS sum_r FROM px GROUP BY doc_id
    ),
    bits AS (
      SELECT p.doc_id,
             p.y * 8 + p.x AS pos,
             CASE WHEN 64 * p.r > s.sum_r THEN 1 ELSE 0 END AS bit
      FROM px p JOIN stat s ON p.doc_id = s.doc_id
    ),
    hashes AS (
      SELECT doc_id,
             CAST(SUM(CASE WHEN pos < 32 THEN bit * (1::BIGINT << pos)
                           ELSE 0 END) AS BIGINT) AS hash_lo,
             CAST(SUM(CASE WHEN pos >= 32 THEN bit * (1::BIGINT << (pos - 32))
                           ELSE 0 END) AS BIGINT) AS hash_hi
      FROM bits GROUP BY doc_id
    )
    SELECT hash_hi, hash_lo,
           CAST(COUNT(*) AS BIGINT) AS n_images,
           CAST(MIN(doc_id) AS BIGINT) AS min_doc_id
    FROM hashes
    GROUP BY hash_hi, hash_lo
    HAVING COUNT(*) >= 2
    ORDER BY n_images DESC, min_doc_id ASC
    LIMIT 20
    """,
)
def q_mm_image_ahash_groups(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Perceptual near-dup image groups via average-hash (aHash).

    Encodes each document's parametric BMP (same image family as
    ``mm_bmp_roundtrip_features``: width ``8 + doc_id % 8``, height 8,
    red channel ``(doc_id*x + y) % 256``), decodes the real bytes, and
    computes the canonical aHash over the fixed top-left 8x8 red-
    channel crop: ``bit(x,y) = [64*r(x,y) > sum(crop)]`` (the integer
    form of "pixel above crop mean" — no division, so both engines
    agree exactly), packed little-endian by ``pos = y*8 + x`` into two
    BIGINT halves. The red channel depends only on ``doc_id % 256``,
    so documents congruent mod 256 produce byte-identical crops —
    genuine duplicate groups the hash must recover.

    Scale: payloads stay inside the two mapInPandas stages; the only
    shuffle is a hash aggregate on the 16-byte (hash_hi, hash_lo) key
    followed by TakeOrdered — the billion-image dedup shape.
    """

    def encode(it):
        import struct

        import pandas as pd

        for pdf in it:
            payloads = []
            for doc_id in pdf["doc_id"]:
                doc_id = int(doc_id)
                w, h = 8 + doc_id % 8, 8
                row_len = (w * 3 + 3) & ~3
                pix = bytearray()
                for y in range(h - 1, -1, -1):  # bottom-up storage
                    row = bytearray()
                    for x in range(w):
                        row += bytes(
                            [
                                (doc_id + x) % 256,      # B
                                (x * y) % 256,           # G
                                (doc_id * x + y) % 256,  # R
                            ]
                        )
                    row += b"\x00" * (row_len - len(row))
                    pix += row
                size = 14 + 40 + len(pix)
                hdr = struct.pack("<2sIHHI", b"BM", size, 0, 0, 54)
                info = struct.pack(
                    "<IiiHHIIiiII",
                    40, w, h, 1, 24, 0, len(pix), 2835, 2835, 0, 0,
                )
                payloads.append(bytes(hdr + info + pix))
            yield pd.DataFrame({"doc_id": pdf["doc_id"], "payload": payloads})

    def ahash(it):
        import struct

        import pandas as pd

        for pdf in it:
            out = {"doc_id": [], "hash_lo": [], "hash_hi": []}
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                magic, _, _, _, offset = struct.unpack_from("<2sIHHI", payload, 0)
                assert magic == b"BM"
                _, w, h, _, bpp = struct.unpack_from("<IiiHH", payload, 14)
                assert bpp == 24
                row_len = (w * 3 + 3) & ~3
                # red channel of the logical top-left 8x8 crop; storage
                # is bottom-up, so logical row y lives at stored row
                # h-1-y
                crop = [
                    payload[offset + (h - 1 - y) * row_len + 3 * x + 2]
                    for y in range(8)
                    for x in range(8)
                ]
                total = sum(crop)
                lo = hi = 0
                for y in range(8):
                    for x in range(8):
                        if 64 * crop[y * 8 + x] > total:
                            pos = y * 8 + x
                            if pos < 32:
                                lo |= 1 << pos
                            else:
                                hi |= 1 << (pos - 32)
                out["doc_id"].append(int(doc_id))
                out["hash_lo"].append(lo)
                out["hash_hi"].append(hi)
            yield pd.DataFrame(out)

    d = parallelize(
        load_table(spark, "documents", sf_dir).select("doc_id"), spark
    )
    hashes = d.mapInPandas(encode, schema=_PAYLOAD_SCHEMA).mapInPandas(
        ahash, schema="doc_id long, hash_lo long, hash_hi long"
    )
    return (
        hashes.groupBy("hash_hi", "hash_lo")
        .agg(
            F.count(F.lit(1)).alias("n_images"),
            F.min("doc_id").alias("min_doc_id"),
        )
        .filter(F.col("n_images") >= 2)
        .orderBy(F.desc("n_images"), F.asc("min_doc_id"))
        .limit(20)
    )


@query(
    "mm_audio_vad_features",
    oracle=f"""
    WITH clip AS (
      SELECT doc_id, 800 + (doc_id % 5) * 100 AS n FROM documents
    ),
    s AS (
      SELECT c.doc_id, g.i,
             (c.doc_id * 31 + g.i * 17) % 2048 - 1024 AS smp
      FROM clip c, UNNEST(generate_series(0, c.n - 1)) AS g(i)
    ),
    x AS (
      SELECT doc_id, smp,
             LAG(smp) OVER (PARTITION BY doc_id ORDER BY i) AS prev
      FROM s
    )
    SELECT doc_id,
           CAST(COUNT(*) AS BIGINT) AS n_frames,
           CAST(SUM(CASE WHEN prev IS NOT NULL
                          AND (smp >= 0) <> (prev >= 0)
                     THEN 1 ELSE 0 END) AS BIGINT) AS zero_crossings,
           CAST(MAX(ABS(smp)) AS BIGINT) AS peak,
           CAST(SUM(CASE WHEN ABS(smp) > {_ACTIVE_ABS}
                     THEN 1 ELSE 0 END) AS BIGINT) AS n_active
    FROM x GROUP BY doc_id
    """,
)
def q_mm_audio_vad_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Voice-activity features from real WAV decode: zero-crossing
    count, peak amplitude, active-sample count.

    Same parametric clip family as ``mm_wav_roundtrip_features``
    (``n = 800 + doc_id%5*100`` frames of
    ``(doc_id*31 + i*17) % 2048 - 1024``); the features are the
    standard VAD trio and every one is an integer the oracle derives
    from the closed form (zero crossings via LAG sign compare, sign
    convention ``s >= 0``). The decode path is genuine: ``wave``
    re-parses the RIFF container and numpy folds the PCM stream
    vectorized per Arrow batch.

    Scale: shuffle-free — features are computed per-row inside the
    decode stage; downstream consumers see 4 BIGINTs per clip.
    """

    def encode(it):
        import io
        import struct
        import wave

        import pandas as pd

        for pdf in it:
            payloads = []
            for doc_id in pdf["doc_id"]:
                doc_id = int(doc_id)
                n = 800 + (doc_id % 5) * 100
                samples = [
                    (doc_id * 31 + i * 17) % 2048 - 1024 for i in range(n)
                ]
                buf = io.BytesIO()
                with wave.open(buf, "wb") as w:
                    w.setnchannels(1)
                    w.setsampwidth(2)
                    w.setframerate(_WAV_RATE)
                    w.writeframes(struct.pack(f"<{n}h", *samples))
                payloads.append(buf.getvalue())
            yield pd.DataFrame({"doc_id": pdf["doc_id"], "payload": payloads})

    active_abs = _ACTIVE_ABS

    def vad(it):
        import io
        import wave

        import numpy as np
        import pandas as pd

        for pdf in it:
            out = {"doc_id": [], "n_frames": [], "zero_crossings": [],
                   "peak": [], "n_active": []}
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                with wave.open(io.BytesIO(payload), "rb") as w:
                    n = w.getnframes()
                    raw = w.readframes(n)
                s = np.frombuffer(raw, dtype="<i2").astype(np.int64)
                nonneg = s >= 0
                out["doc_id"].append(int(doc_id))
                out["n_frames"].append(n)
                out["zero_crossings"].append(
                    int(np.count_nonzero(nonneg[1:] != nonneg[:-1]))
                )
                out["peak"].append(int(np.max(np.abs(s))))
                out["n_active"].append(
                    int(np.count_nonzero(np.abs(s) > active_abs))
                )
            yield pd.DataFrame(out)

    d = parallelize(
        load_table(spark, "documents", sf_dir).select("doc_id"), spark
    )
    return d.mapInPandas(encode, schema=_PAYLOAD_SCHEMA).mapInPandas(
        vad,
        schema=(
            "doc_id long, n_frames long, zero_crossings long, "
            "peak long, n_active long"
        ),
    )


@query(
    "mm_image_resize_thumb",
    oracle="""
    WITH dims AS (
      SELECT doc_id, 8 + doc_id % 8 AS w, 8 AS h FROM documents
    ),
    px AS (
      SELECT d.doc_id,
             (gx.x * 4) // d.w AS bx,
             gy.y // 2 AS by,
             (d.doc_id * gx.x + gy.y) % 256 AS r
      FROM dims d,
           UNNEST(generate_series(0, d.w - 1)) AS gx(x),
           UNNEST(generate_series(0, 7)) AS gy(y)
    ),
    boxes AS (
      SELECT doc_id, bx, by, SUM(r) // COUNT(*) AS v
      FROM px GROUP BY doc_id, bx, by
    )
    SELECT doc_id,
           CAST(MAX(CASE WHEN bx = 0 AND by = 0 THEN v END) AS BIGINT) AS t00,
           CAST(MAX(CASE WHEN bx = 3 AND by = 0 THEN v END) AS BIGINT) AS t30,
           CAST(MAX(CASE WHEN bx = 0 AND by = 3 THEN v END) AS BIGINT) AS t03,
           CAST(MAX(CASE WHEN bx = 3 AND by = 3 THEN v END) AS BIGINT) AS t33,
           CAST(SUM(v) AS BIGINT) AS thumb_sum
    FROM boxes GROUP BY doc_id
    """,
)
def q_mm_image_resize_thumb(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL image resize (the multimodal mandate's "resize" op): decode
    the BMP bytes and box-average the red channel down to a 4x4
    thumbnail (pixel x lands in box ``x*4 // w``, integer mean per
    box), reporting the corner cells and the thumbnail sum.

    The downsample is exact integer arithmetic, so the oracle predicts
    every thumbnail value from the parametric pixel formula without
    parsing a byte — one flipped pixel anywhere in the codec or the
    box assignment shifts a corner or the sum.

    Scale: same two-mapInPandas shape as the other media ops; resize
    output is 5 BIGINTs per image (production would emit the thumbnail
    bytes — identical plumbing).
    """

    def encode(it):
        import struct

        import pandas as pd

        for pdf in it:
            payloads = []
            for doc_id in pdf["doc_id"]:
                doc_id = int(doc_id)
                w, h = 8 + doc_id % 8, 8
                row_len = (w * 3 + 3) & ~3
                pix = bytearray()
                for y in range(h - 1, -1, -1):
                    row = bytearray()
                    for x in range(w):
                        row += bytes(
                            [
                                (doc_id + x) % 256,
                                (x * y) % 256,
                                (doc_id * x + y) % 256,
                            ]
                        )
                    row += b"\x00" * (row_len - len(row))
                    pix += row
                size = 14 + 40 + len(pix)
                hdr = struct.pack("<2sIHHI", b"BM", size, 0, 0, 54)
                info = struct.pack(
                    "<IiiHHIIiiII",
                    40, w, h, 1, 24, 0, len(pix), 2835, 2835, 0, 0,
                )
                payloads.append(bytes(hdr + info + pix))
            yield pd.DataFrame({"doc_id": pdf["doc_id"], "payload": payloads})

    def resize(it):
        import struct

        import numpy as np
        import pandas as pd

        for pdf in it:
            out = {"doc_id": [], "t00": [], "t30": [], "t03": [],
                   "t33": [], "thumb_sum": []}
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                magic, _, _, _, offset = struct.unpack_from("<2sIHHI", payload, 0)
                assert magic == b"BM"
                _, w, h, _, bpp = struct.unpack_from("<IiiHH", payload, 14)
                assert bpp == 24
                row_len = (w * 3 + 3) & ~3
                # red channel, logical row order (storage is bottom-up)
                red = np.zeros((h, w), dtype=np.int64)
                for y in range(h):
                    base = offset + (h - 1 - y) * row_len
                    red[y] = [payload[base + 3 * x + 2] for x in range(w)]
                thumb = np.zeros((4, 4), dtype=np.int64)
                xs = np.arange(w) * 4 // w
                ys = np.arange(h) * 4 // h
                for by in range(4):
                    for bx in range(4):
                        box = red[np.ix_(ys == by, xs == bx)]
                        thumb[by, bx] = int(box.sum()) // box.size
                out["doc_id"].append(int(doc_id))
                out["t00"].append(int(thumb[0, 0]))
                out["t30"].append(int(thumb[0, 3]))
                out["t03"].append(int(thumb[3, 0]))
                out["t33"].append(int(thumb[3, 3]))
                out["thumb_sum"].append(int(thumb.sum()))
            yield pd.DataFrame(out)

    d = parallelize(
        load_table(spark, "documents", sf_dir).select("doc_id"), spark
    )
    return d.mapInPandas(encode, schema=_PAYLOAD_SCHEMA).mapInPandas(
        resize,
        schema="doc_id long, t00 long, t30 long, t03 long, t33 long, thumb_sum long",
    )


@query(
    "mm_audio_resample_stats",
    oracle=f"""
    WITH clip AS (
      SELECT doc_id, 800 + (doc_id % 5) * 100 AS n FROM documents
    ),
    s AS (
      SELECT c.doc_id, g.i,
             (c.doc_id * 31 + g.i * 17) % 2048 - 1024 AS smp
      FROM clip c, UNNEST(generate_series(0, c.n - 1)) AS g(i)
      WHERE g.i % 2 = 0
    )
    SELECT doc_id,
           CAST(COUNT(*) AS BIGINT) AS n_out,
           CAST({_WAV_RATE // 2} AS BIGINT) AS out_rate,
           CAST(SUM(smp * smp) AS BIGINT) AS sum_sq_out,
           CAST(MAX(ABS(smp)) AS BIGINT) AS peak_out
    FROM s GROUP BY doc_id
    """,
)
def q_mm_audio_resample_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Audio resampling (decimation by 2, 8 kHz -> 4 kHz): decode the
    real WAV, keep every even-indexed sample, report the resampled
    stream's stats — the oracle predicts them from the closed-form
    sample formula restricted to even i.

    Production decimators low-pass first; the plumbing (decode ->
    vectorized resample -> re-encode or featurize) is what this pins,
    sample-exact.
    """

    def encode(it):
        import io
        import struct
        import wave

        import pandas as pd

        for pdf in it:
            payloads = []
            for doc_id in pdf["doc_id"]:
                doc_id = int(doc_id)
                n = 800 + (doc_id % 5) * 100
                samples = [
                    (doc_id * 31 + i * 17) % 2048 - 1024 for i in range(n)
                ]
                buf = io.BytesIO()
                with wave.open(buf, "wb") as w:
                    w.setnchannels(1)
                    w.setsampwidth(2)
                    w.setframerate(_WAV_RATE)
                    w.writeframes(struct.pack(f"<{n}h", *samples))
                payloads.append(buf.getvalue())
            yield pd.DataFrame({"doc_id": pdf["doc_id"], "payload": payloads})

    def resample(it):
        import io
        import wave

        import numpy as np
        import pandas as pd

        for pdf in it:
            out = {"doc_id": [], "n_out": [], "out_rate": [],
                   "sum_sq_out": [], "peak_out": []}
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                with wave.open(io.BytesIO(payload), "rb") as w:
                    rate = w.getframerate()
                    n = w.getnframes()
                    raw = w.readframes(n)
                s = np.frombuffer(raw, dtype="<i2").astype(np.int64)[::2]
                out["doc_id"].append(int(doc_id))
                out["n_out"].append(len(s))
                out["out_rate"].append(rate // 2)
                out["sum_sq_out"].append(int(np.sum(s * s)))
                out["peak_out"].append(int(np.max(np.abs(s))))
            yield pd.DataFrame(out)

    d = parallelize(
        load_table(spark, "documents", sf_dir).select("doc_id"), spark
    )
    return d.mapInPandas(encode, schema=_PAYLOAD_SCHEMA).mapInPandas(
        resample,
        schema=(
            "doc_id long, n_out long, out_rate long, "
            "sum_sq_out long, peak_out long"
        ),
    )

"""REAL multimodal decode with stdlib codecs (upgrades multimodal.py).

``multimodal.py`` documents why Pillow/PyAV-backed decode is stubbed
(no codec libraries in this environment). This module closes the gap
for two formats the Python *standard library* can genuinely encode and
decode — no external dependency:

- **WAV** (RIFF PCM audio): ``wave`` + ``struct``. Real RIFF headers,
  real 16-bit PCM frames; the decoder re-parses the container and the
  sample stream.
- **BMP** (Windows bitmap): ``struct``-packed BITMAPFILEHEADER +
  BITMAPINFOHEADER + bottom-up BGR pixel rows with 4-byte padding; the
  decoder walks the actual byte layout.

Payloads are synthesized deterministically from ``doc_id`` so every
decoded feature has a closed-form integer value — which means a DuckDB
oracle can *predict* what a correct decoder must output
(``generate_series`` + modular arithmetic) without being able to parse
the bytes itself. The decode is real; the oracle is exact.

Scale notes: encode and decode are ``mapInPandas`` stages — Arrow
record batches, vectorized per-batch Python, payload bytes never
inflate into JVM rows between the stages. This is precisely the 100 TB
media-pipeline shape: opaque binary in Parquet, narrow Python map for
the codec, relational aggregation after feature extraction. All batch
functions are closures so cloudpickle ships them by value and workers
never need this package importable (see multimodal.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import BinaryType, LongType, StructField, StructType

from flink_kakfa_spark.registry import query
from flink_kakfa_spark.sources.tables import load_table, parallelize

_WAV_RATE = 8000

_PAYLOAD_SCHEMA = StructType(
    [StructField("doc_id", LongType()), StructField("payload", BinaryType())]
)


@query(
    "mm_wav_roundtrip_features",
    oracle=f"""
    WITH clip AS (
      SELECT doc_id, 800 + (doc_id % 5) * 100 AS n FROM documents
    ),
    s AS (
      SELECT c.doc_id, c.n,
             (c.doc_id * 31 + g.i * 17) % 2048 - 1024 AS smp
      FROM clip c, UNNEST(generate_series(0, c.n - 1)) AS g(i)
    )
    SELECT
      doc_id,
      CAST({_WAV_RATE} AS BIGINT) AS sample_rate,
      CAST(ANY_VALUE(n) AS BIGINT) AS n_frames,
      CAST(ANY_VALUE(n) * 1000 // {_WAV_RATE} AS BIGINT) AS duration_ms,
      CAST(SUM(smp * smp) AS BIGINT) AS sum_sq
    FROM s GROUP BY doc_id
    """,
)
def q_mm_wav_roundtrip_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Audio path: encode real WAV bytes, decode them back, extract
    features — and let the oracle predict the decoder's exact output.

    Clip shape (shared with the oracle as closed forms):
    ``n_frames = 800 + (doc_id % 5) * 100``; sample i is
    ``(doc_id*31 + i*17) % 2048 - 1024`` (16-bit mono, 8 kHz). The
    oracle cannot parse RIFF, but it computes in SQL what a CORRECT
    parse must yield, sample-exact — ``sum_sq`` folds every PCM sample,
    so one flipped bit anywhere in encode, container, or decode
    changes it.
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

    def decode(it):
        import io
        import struct
        import wave

        import pandas as pd

        for pdf in it:
            out = {"doc_id": [], "sample_rate": [], "n_frames": [],
                   "duration_ms": [], "sum_sq": []}
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                with wave.open(io.BytesIO(payload), "rb") as w:
                    rate = w.getframerate()
                    n = w.getnframes()
                    raw = w.readframes(n)
                samples = struct.unpack(f"<{n}h", raw)
                out["doc_id"].append(int(doc_id))
                out["sample_rate"].append(rate)
                out["n_frames"].append(n)
                out["duration_ms"].append(n * 1000 // rate)
                out["sum_sq"].append(sum(s * s for s in samples))
            yield pd.DataFrame(out)

    d = parallelize(
        load_table(spark, "documents", sf_dir).select("doc_id"), spark
    )
    return d.mapInPandas(encode, schema=_PAYLOAD_SCHEMA).mapInPandas(
        decode,
        schema=(
            "doc_id long, sample_rate long, n_frames long, "
            "duration_ms long, sum_sq long"
        ),
    )


@query(
    "mm_bmp_roundtrip_features",
    oracle="""
    WITH dims AS (
      SELECT doc_id, 8 + doc_id % 8 AS w, 8 AS h FROM documents
    ),
    px AS (
      SELECT d.doc_id, d.w, d.h,
             (d.doc_id + gx.x) % 256 AS b,
             (gx.x * gy.y) % 256 AS g,
             (d.doc_id * gx.x + gy.y) % 256 AS r
      FROM dims d,
           UNNEST(generate_series(0, d.w - 1)) AS gx(x),
           UNNEST(generate_series(0, d.h - 1)) AS gy(y)
    )
    SELECT
      doc_id,
      CAST(ANY_VALUE(w) AS BIGINT) AS width,
      CAST(ANY_VALUE(h) AS BIGINT) AS height,
      CAST(SUM(b) AS BIGINT) AS sum_b,
      CAST(SUM(g) AS BIGINT) AS sum_g,
      CAST(SUM(r) AS BIGINT) AS sum_r
    FROM px GROUP BY doc_id
    """,
)
def q_mm_bmp_roundtrip_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Image path: encode real BMP bytes, decode them back, extract
    per-channel statistics; oracle predicts the exact sums.

    Image shape (shared with the oracle): width ``8 + doc_id % 8``,
    height 8; pixel (x, y) has B ``(doc_id+x)%256``, G ``(x*y)%256``,
    R ``(doc_id*x+y)%256``. Any error in the byte layout — padding,
    bottom-up row order, BGR channel order, header offsets — shifts a
    channel sum and fails the hash. A genuine (if minimal) image codec
    exercised through the exact mapInPandas plumbing a Pillow-backed
    decoder would use.
    """

    def encode(it):
        import struct

        import pandas as pd

        for pdf in it:
            payloads = []
            for doc_id in pdf["doc_id"]:
                doc_id = int(doc_id)
                w, h = 8 + doc_id % 8, 8
                row_len = (w * 3 + 3) & ~3  # rows pad to 4-byte boundary
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

    def decode(it):
        import struct

        import pandas as pd

        for pdf in it:
            out = {"doc_id": [], "width": [], "height": [],
                   "sum_b": [], "sum_g": [], "sum_r": []}
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                magic, _, _, _, offset = struct.unpack_from("<2sIHHI", payload, 0)
                assert magic == b"BM"
                _, w, h, _, bpp = struct.unpack_from("<IiiHH", payload, 14)
                assert bpp == 24
                row_len = (w * 3 + 3) & ~3
                sb = sg = sr = 0
                for y_stored in range(h):
                    base = offset + y_stored * row_len
                    for x in range(w):
                        b, g, r = payload[base + 3 * x : base + 3 * x + 3]
                        sb, sg, sr = sb + b, sg + g, sr + r
                out["doc_id"].append(int(doc_id))
                out["width"].append(w)
                out["height"].append(h)
                out["sum_b"].append(sb)
                out["sum_g"].append(sg)
                out["sum_r"].append(sr)
            yield pd.DataFrame(out)

    d = parallelize(
        load_table(spark, "documents", sf_dir).select("doc_id"), spark
    )
    return d.mapInPandas(encode, schema=_PAYLOAD_SCHEMA).mapInPandas(
        decode,
        schema=(
            "doc_id long, width long, height long, "
            "sum_b long, sum_g long, sum_r long"
        ),
    )

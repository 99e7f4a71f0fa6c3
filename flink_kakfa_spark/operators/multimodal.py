"""Multimodal column plumbing (driver mandate): opaque ``binary``
payloads + typed metadata, with decode / feature-extract / frame-sample
stages as Arrow-batched pandas functions over ``mapInPandas``.

The container has no image/audio codecs, so the *decode* itself is a
deterministic fake (documented below and in the oracle); everything
Spark-side — binary column handling, schema contracts, mapInPandas
batch iteration, partition behavior — is real and tested.

Scale notes (100 TB of media): payloads stay opaque binary end-to-end
(no JVM→Python copy until the decode stage), mapInPandas streams Arrow
record batches so one task never materializes its whole partition, and
metadata-only queries (length, digest, format sniff) never touch
Python at all.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import (
    DoubleType, IntegerType, LongType, StructField, StructType,
)

from flink_kakfa_spark.registry import query
from flink_kakfa_spark.sources.tables import load_table, parallelize

N_FRAMES = 3  # deterministic fake "video": 3 frames per document


def with_payload(df: DataFrame) -> DataFrame:
    """Attach the opaque media column: the document text as bytes.

    Stand-in for a real image/audio/video payload column; every
    downstream stage treats it as opaque ``binary``.
    """
    return df.filter(F.col("text").isNotNull()).select(
        "doc_id", F.col("text").cast("binary").alias("payload"), "n_chars"
    )  # decode stages skip payload-less rows (null-safe by contract)


@query(
    "mm_binary_metadata",
    oracle="""
    SELECT
      doc_id,
      octet_length(encode(text)) AS n_bytes,
      md5(text) AS checksum,
      CASE WHEN octet_length(encode(text)) >= 256 THEN 'large' ELSE 'small' END AS size_class
    FROM documents
    """,
)
def q_mm_binary_metadata(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Metadata over opaque binary: byte length, digest, size class.

    JVM-only path — binary never crosses into Python.
    """
    d = with_payload(load_table(spark, "documents", sf_dir))
    return d.select(
        "doc_id",
        F.length("payload").alias("n_bytes"),
        F.md5("payload").alias("checksum"),
        F.when(F.length("payload") >= 256, "large").otherwise("small").alias("size_class"),
    )


_FRAME_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("frame_idx", IntegerType()),
        StructField("width", IntegerType()),
        StructField("height", IntegerType()),
        StructField("brightness", DoubleType()),
    ]
)

# NOTE: the pandas batch functions below are defined as closures inside
# their query functions, NOT at module level. Module-level functions are
# cloudpickled *by reference* and Spark's Python workers would need
# flink_kakfa_spark importable on their sys.path — not true when a driver
# imports __spark_entry__.py from an arbitrary cwd. Closures are pickled
# by value and only need pandas/numpy on the workers.


@query(
    "mm_decode_frames",
    oracle="""
    SELECT
      d.doc_id,
      CAST(g.frame_idx AS INTEGER) AS frame_idx,
      CAST(64 + (d.doc_id % 4) * 64 AS INTEGER) AS width,
      CAST(64 + (d.doc_id % 3) * 64 AS INTEGER) AS height,
      CAST(((d.doc_id * 31 + g.frame_idx * 7) % 256) AS DOUBLE) / 255.0 AS brightness
    FROM documents d, UNNEST(generate_series(0, 2)) AS g(frame_idx)
    """,
)
def q_mm_decode_frames(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Decode/frame-sample stage: binary payload → per-frame rows.

    Real mapInPandas plumbing (Arrow batches of opaque binary in,
    multi-row frame records out); the decode arithmetic is the
    documented deterministic fake, which is why an exact SQL oracle
    exists at all:
      width  = 64 + (doc_id % 4) * 64
      height = 64 + (doc_id % 3) * 64
      brightness = ((doc_id * 31 + frame_idx * 7) % 256) / 255.0
    A real deployment calls PyAV/Pillow on ``payload`` instead (see
    :func:`decode_image`).
    """
    n_frames = N_FRAMES
    cols = [f.name for f in _FRAME_SCHEMA.fields]

    def decode_frames(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import pandas as _pd

        for pdf in batches:
            if len(pdf) == 0:
                continue
            rows = []
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                assert isinstance(payload, (bytes, bytearray))  # opaque binary in
                for f_idx in range(n_frames):
                    rows.append(
                        (
                            int(doc_id),
                            f_idx,
                            64 + (int(doc_id) % 4) * 64,
                            64 + (int(doc_id) % 3) * 64,
                            ((int(doc_id) * 31 + f_idx * 7) % 256) / 255.0,
                        )
                    )
            yield _pd.DataFrame(rows, columns=cols)

    d = with_payload(parallelize(load_table(spark, "documents", sf_dir), spark))
    return d.select("doc_id", "payload").mapInPandas(decode_frames, _FRAME_SCHEMA)


_FEAT_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("f_mean", DoubleType()),
        StructField("f_min", DoubleType()),
        StructField("f_max", DoubleType()),
        StructField("f_mod", DoubleType()),
        StructField("n_bytes", IntegerType()),
    ]
)


@query(
    "mm_extract_features",
    oracle="""
    -- byte-faithful: decode each utf-8 BYTE from the hex rendering
    -- (ord(substr(text,...)) would yield CODEPOINTS and diverge from
    -- the byte-level codec on any non-ASCII document)
    WITH b AS (
      SELECT doc_id, hex(encode(text)) AS hx,
             octet_length(encode(text)) AS n
      FROM documents WHERE text IS NOT NULL
    ),
    bytes AS (
      SELECT doc_id,
             (strpos('0123456789ABCDEF', substr(hx, 2*i - 1, 1)) - 1) * 16
             + (strpos('0123456789ABCDEF', substr(hx, 2*i, 1)) - 1) AS v
      FROM b, UNNEST(generate_series(1, n)) AS g(i)
    ),
    stats AS (
      SELECT doc_id,
             CAST(SUM(v) AS DOUBLE) / COUNT(*) AS mean_v,
             MIN(v) AS min_v,
             MAX(v) AS max_v,
             COUNT(*) AS n
      FROM bytes GROUP BY doc_id
    )
    SELECT
      doc_id,
      mean_v AS f_mean,
      CAST(min_v AS DOUBLE) AS f_min,
      CAST(max_v AS DOUBLE) AS f_max,
      CAST(n % 97 AS DOUBLE) AS f_mod,
      CAST(n AS INTEGER) AS n_bytes
    FROM stats
    """,
)
def q_mm_extract_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Feature-extract stage: binary payload → fixed-dim float vector.

    The numpy byte-summary stands in for a vision encoder; the
    contract (binary in, fixed-dim float features out, one row per
    doc) is the real deliverable. The 4 feature dims are emitted as
    scalar columns (not array<double>) so the driver's pandas-based
    canonicalizer can sort the result — r4 showed it cannot factorize
    list-typed cells. The payloads are UTF-8 text bytes and the corpus
    is pure ASCII, so the DuckDB oracle reproduces the byte stream
    with ord(substr(...)) and the mean is an exact integer-sum/count —
    value-exact across engines (upgraded from the old rows-only
    check).
    """

    def extract_features(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np
        import pandas as _pd

        for pdf in batches:
            if len(pdf) == 0:
                continue
            out = {
                "doc_id": [], "f_mean": [], "f_min": [], "f_max": [],
                "f_mod": [], "n_bytes": [],
            }
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                arr = np.frombuffer(bytes(payload), dtype=np.uint8)
                # deterministic 4-dim summary of the byte stream
                out["doc_id"].append(int(doc_id))
                out["f_mean"].append(float(arr.mean()))
                out["f_min"].append(float(arr.min()))
                out["f_max"].append(float(arr.max()))
                out["f_mod"].append(float(len(arr) % 97))
                out["n_bytes"].append(len(arr))
            yield _pd.DataFrame(out)

    d = with_payload(parallelize(load_table(spark, "documents", sf_dir), spark))
    return d.select("doc_id", "payload").mapInPandas(extract_features, _FEAT_SCHEMA)


def decode_image(payload: bytes) -> "object":
    """Real image decode — requires Pillow, absent in this container."""
    raise NotImplementedError(
        "image/audio codecs are not installed in this environment; "
        "swap _decode_frames'/_extract_features' fake arithmetic for "
        "PIL.Image.open(io.BytesIO(payload)) / PyAV in production"
    )

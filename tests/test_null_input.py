"""Null-injection sweep: every registered query must survive NULLs in
the nullable string columns (the reality of any crawled corpus or
loosely-typed event stream). Caught four real crashes when added:
NoneType->bytes in three Arrow codecs, and zero-vector /
out-of-bounds evaluation in the pyspark.ml LSH path when Catalyst
re-executes collapsed projections on pre-filter rows."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from flink_kakfa_spark.registry import all_queries

STRING_NULLS = {
    "documents": ["text", "lang", "source"],
    "events": ["event_type", "props"],
    "orders": ["o_orderstatus", "o_orderpriority"],
    "lineitem": ["l_returnflag", "l_linestatus"],
    "part": ["p_name", "p_brand", "p_type"],
}
TABLES = [
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
]


@pytest.fixture(scope="module")
def null_sf(spark, tmp_path_factory) -> str:
    out = tmp_path_factory.mktemp("null_sf")
    for t in TABLES:
        df = spark.read.parquet(f"/root/testdata/sf0.001/{t}.parquet")
        key = df.columns[0]
        for c in STRING_NULLS.get(t, []):
            df = df.withColumn(
                c,
                F.when(F.col(key) % 10 == 3, F.lit(None)).otherwise(
                    F.col(c)
                ),
            )
        df.coalesce(1).write.parquet(str(out / f"{t}.parquet"))
    return str(out)


def test_every_query_survives_null_strings(spark, null_sf):
    fails = []
    for name, fn in all_queries().items():
        try:
            fn(spark, null_sf).write.format("noop").mode("overwrite").save()
        except Exception as e:  # noqa: BLE001 - collecting the sweep
            fails.append(f"{name}: {str(e).splitlines()[0][:120]}")
    assert not fails, "\n".join(fails)

"""Empty-input sweep: every registered query must plan and execute on
0-row tables (the degenerate partition every 1000-executor job
eventually feeds an operator) without raising."""

from __future__ import annotations

import pytest

from flink_kakfa_spark.registry import all_queries

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
def empty_sf(spark, tmp_path_factory) -> str:
    out = tmp_path_factory.mktemp("empty_sf")
    for t in TABLES:
        (
            spark.read.parquet(f"/root/testdata/sf0.001/{t}.parquet")
            .limit(0)
            .coalesce(1)
            .write.parquet(str(out / f"{t}.parquet"))
        )
    return str(out)


def test_every_query_survives_empty_input(spark, empty_sf):
    fails = []
    for name, fn in all_queries().items():
        try:
            fn(spark, empty_sf).write.format("noop").mode("overwrite").save()
        except Exception as e:  # noqa: BLE001 - collecting the sweep
            fails.append(f"{name}: {str(e).splitlines()[0][:120]}")
    assert not fails, "\n".join(fails)

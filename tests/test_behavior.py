"""Funnel and salted-aggregation operators: semantics + scale posture."""

from __future__ import annotations

from pyspark.sql import Row
from pyspark.sql import functions as F

from flink_kakfa_spark.registry import all_queries


def _events(spark, tmp_path, rows):
    df = spark.createDataFrame(
        [
            Row(
                event_id=i,
                ts=t,
                user_id=u,
                event_type=et,
                value=1.0,
                props="{}",
            )
            for i, (u, et, t) in enumerate(rows)
        ],
        "event_id long, ts string, user_id long, event_type string, value double, props string",
    ).withColumn("ts", F.to_timestamp("ts"))
    df.write.parquet(str(tmp_path / "events.parquet"))


def test_funnel_ordering_is_respected(spark, tmp_path):
    """A click BEFORE signup must not count; order within a user matters."""
    _events(
        spark,
        tmp_path,
        [
            # u1: full ordered funnel
            (1, "signup", "2024-01-01 00:00:00"),
            (1, "click", "2024-01-01 00:01:00"),
            (1, "purchase", "2024-01-01 00:02:00"),
            # u2: click BEFORE signup, purchase after -> counts signup only
            (2, "click", "2024-01-01 00:00:00"),
            (2, "signup", "2024-01-01 00:01:00"),
            (2, "purchase", "2024-01-01 00:02:00"),
            # u3: signup then click, purchase before click -> no purchase stage
            (3, "signup", "2024-01-01 00:00:00"),
            (3, "purchase", "2024-01-01 00:00:30"),
            (3, "click", "2024-01-01 00:01:00"),
            # u4: never signs up
            (4, "click", "2024-01-01 00:00:00"),
            (4, "purchase", "2024-01-01 00:01:00"),
        ],
    )
    row = all_queries()["funnel_signup_click_purchase"](
        spark, str(tmp_path)
    ).collect()[0]
    assert row["n_signup"] == 3  # u1, u2, u3
    assert row["n_click_after"] == 2  # u1, u3 (u2's click was pre-signup)
    assert row["n_purchase_after"] == 1  # u1 only
    assert row["r_click"] == round(2 / 3, 4)
    assert row["r_purchase"] == 0.5


def test_funnel_plan_shuffles_once_per_user_partition(spark, sf_dir):
    """Both window stages and the per-user rollup share ONE user_id
    exchange; only the final global aggregate adds a second (tiny)
    single-partition exchange."""
    df = all_queries()["funnel_signup_click_purchase"](spark, sf_dir)
    df.write.format("noop").mode("overwrite").save()
    plan = df._jdf.queryExecution().executedPlan().toString()
    exchanges = plan.count("Exchange ") + plan.count("Exchange(")
    reuses = plan.count("ReusedExchange")
    assert exchanges - reuses <= 2, f"fact table shuffled more than once:\n{plan}"


def test_salted_wordcount_equals_plain(spark, sf_dir):
    """Salting must be invisible in the result."""
    got = {
        r["word"]: r["cnt"]
        for r in all_queries()["agg_salted_wordcount"](spark, sf_dir).collect()
    }
    want = {
        r["word"]: r["cnt"]
        for r in all_queries()["wordcount"](spark, sf_dir).collect()
    }
    assert got == want

"""Behavioral/product analytics operators: semantics + scale posture."""

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
                value=v,
                props="{}",
            )
            for i, (u, et, t, v) in enumerate(rows)
        ],
        "event_id long, ts string, user_id long, event_type string, value double, props string",
    ).withColumn("ts", F.to_timestamp("ts"))
    df.write.parquet(str(tmp_path / "events.parquet"))


def test_cohort_retention_offsets_and_rates(spark, tmp_path):
    """Two users signing up in week of 2024-01-01 (Monday); one active
    the next week -> 50% week-1 retention. Pre-signup activity ignored."""
    _events(
        spark,
        tmp_path,
        [
            (1, "signup", "2024-01-02 10:00:00", 1.0),
            (1, "click", "2024-01-09 10:00:00", 1.0),  # week offset 1
            (2, "signup", "2024-01-03 10:00:00", 1.0),
            (2, "view", "2023-12-20 10:00:00", 1.0),  # before signup: ignored
            (3, "click", "2024-01-02 10:00:00", 1.0),  # never signs up
        ],
    )
    rows = {
        (str(r["cohort_week"]), r["week_offset"]): r
        for r in all_queries()["cohort_weekly_retention"](
            spark, str(tmp_path)
        ).collect()
    }
    assert set(rows) == {("2024-01-01", 0), ("2024-01-01", 1)}
    assert rows[("2024-01-01", 0)]["n_active"] == 2
    assert rows[("2024-01-01", 0)]["retention"] == 1.0
    assert rows[("2024-01-01", 1)]["n_active"] == 1
    assert rows[("2024-01-01", 1)]["retention"] == 0.5


def test_markov_rows_are_conditional_probabilities(spark, sf_dir):
    """Per-from_type probabilities sum to 1 and counts match a manual
    lead-pair recount."""
    rows = all_queries()["markov_event_transitions"](spark, sf_dir).collect()
    by_from: dict[str, float] = {}
    for r in rows:
        by_from[r["from_type"]] = by_from.get(r["from_type"], 0.0) + r["p"]
    for ft, total in by_from.items():
        assert abs(total - 1.0) < 1e-9, (ft, total)


def test_ewma_first_row_equals_daily_mean_and_smooths(spark, tmp_path):
    """ewma_1 = x_1; ewma_2 with alpha=.5 and normalized weights is
    (x1*2 + x2*4)/(2+4) = x1/3 + 2*x2/3."""
    _events(
        spark,
        tmp_path,
        [
            (1, "view", "2024-01-01 01:00:00", 3.0),
            (2, "view", "2024-01-01 02:00:00", 9.0),  # day 1 mean = 6.0
            (1, "view", "2024-01-02 01:00:00", 12.0),  # day 2 mean = 12.0
        ],
    )
    rows = sorted(
        all_queries()["ts_ewma_event_value"](spark, str(tmp_path)).collect(),
        key=lambda r: r["day"],
    )
    assert rows[0]["daily_mean"] == 6.0 and rows[0]["ewma"] == 6.0
    assert rows[1]["daily_mean"] == 12.0
    assert abs(rows[1]["ewma"] - (6.0 / 3 + 2 * 12.0 / 3)) < 1e-12


def test_salted_join_matches_plain_join(spark, sf_dir):
    """Salting must be invisible: same aggregate as the plain join."""
    got = {
        r["o_orderpriority"]: (r["n_items"], r["revenue"])
        for r in all_queries()["join_salted_skew_revenue"](spark, sf_dir).collect()
    }
    from flink_kakfa_spark.sources.tables import load_table

    li = load_table(spark, "lineitem", sf_dir)
    o = load_table(spark, "orders", sf_dir)
    want = {
        r["o_orderpriority"]: (r["n_items"], r["revenue"])
        for r in li.join(o, li.l_orderkey == o.o_orderkey)
        .groupBy("o_orderpriority")
        .agg(
            F.count(F.lit(1)).alias("n_items"),
            F.round(
                F.sum(
                    (F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast(
                        "decimal(18,6)"
                    )
                ).cast("double"),
                2,
            ).alias("revenue"),
        )
        .collect()
    }
    assert got == want


def test_bm25_scores_positive_and_ordered(spark, sf_dir):
    rows = all_queries()["rag_bm25_topk"](spark, sf_dir).collect()
    assert len(rows) == 10
    scores = [r["score"] for r in rows]
    assert scores == sorted(scores, reverse=True)
    assert all(s > 0 for s in scores)


def test_bm25_single_doc_shuffle(spark, sf_dir):
    """The corpus is tokenized and aggregated ONCE: at runtime AQE's
    stage cache turns the stats branch's per-doc aggregate into a
    ReusedExchange, so only one doc_id exchange (plus the tiny 1-row
    stats fold and broadcast) actually moves data. Asserted on the
    FINAL adaptive plan — the static plan prints both exchanges."""
    df = all_queries()["rag_bm25_topk"](spark, sf_dir)
    df.collect()  # finalize the adaptive plan
    plan = df._jdf.queryExecution().executedPlan().toString()
    # AQE's toString appends the pre-execution "Initial Plan" section —
    # count only the stages that actually ran
    plan = plan.split("== Initial Plan ==")[0]
    assert "ReusedExchange" in plan, plan
    exchanges = plan.count("Exchange ") + plan.count("Exchange(")
    reuses = plan.count("ReusedExchange")
    # non-reused stages: the doc_id fact exchange, the 1-row stats fold
    # (SinglePartition over per-partition partials), its broadcast, and
    # the top-k result stage — only the first moves fact-sized data
    assert exchanges - reuses <= 4, plan


def test_first_last_nth_frame_is_full_partition(spark, tmp_path):
    """last_value must see the whole partition (explicit frame), and
    nth_value(2) is NULL for single-order customers."""
    spark.createDataFrame(
        [
            Row(
                o_orderkey=k,
                o_custkey=c,
                o_orderstatus="O",
                o_totalprice=p,
                o_orderdate=d,
                o_orderpriority="1-URGENT",
            )
            for k, c, p, d in [
                (1, 10, 100.0, "1995-01-01"),
                (2, 10, 200.0, "1995-02-01"),
                (3, 10, 300.0, "1995-03-01"),
                (4, 20, 50.0, "1995-01-15"),
            ]
        ],
        "o_orderkey long, o_custkey long, o_orderstatus string, o_totalprice double, o_orderdate string, o_orderpriority string",
    ).withColumn("o_orderdate", F.to_timestamp("o_orderdate")).write.parquet(
        str(tmp_path / "orders.parquet")
    )
    rows = {
        r["o_orderkey"]: r
        for r in all_queries()["window_first_last_nth"](
            spark, str(tmp_path)
        ).collect()
    }
    assert rows[1]["first_price"] == 100.0
    assert rows[1]["last_price"] == 300.0  # full frame, not CURRENT ROW
    assert rows[1]["second_price"] == 200.0
    assert rows[4]["second_price"] is None


def test_growth_first_month_null_then_exact(spark, tmp_path):
    spark.createDataFrame(
        [
            Row(
                o_orderkey=k,
                o_custkey=1,
                o_orderstatus="O",
                o_totalprice=p,
                o_orderdate=d,
                o_orderpriority="1-URGENT",
            )
            for k, p, d in [
                (1, 100.0, "1995-01-05"),
                (2, 50.0, "1995-01-20"),
                (3, 300.0, "1995-02-10"),
            ]
        ],
        "o_orderkey long, o_custkey long, o_orderstatus string, o_totalprice double, o_orderdate string, o_orderpriority string",
    ).withColumn("o_orderdate", F.to_timestamp("o_orderdate")).write.parquet(
        str(tmp_path / "orders.parquet")
    )
    rows = sorted(
        all_queries()["growth_mom_revenue"](spark, str(tmp_path)).collect(),
        key=lambda r: r["month"],
    )
    assert rows[0]["revenue"] == 150.0
    assert rows[0]["delta"] is None and rows[0]["mom_pct"] is None
    assert rows[1]["revenue"] == 300.0
    assert rows[1]["delta"] == 150.0
    assert rows[1]["mom_pct"] == 1.0


def test_attribution_picks_latest_touch_within_window(spark, tmp_path):
    """Latest preceding click/view wins; touches older than 7 days or
    after the purchase don't count."""
    _events(
        spark,
        tmp_path,
        [
            # u1: view then click then purchase -> click (latest) wins
            (1, "view", "2024-01-01 10:00:00", 1.0),
            (1, "click", "2024-01-02 10:00:00", 1.0),
            (1, "purchase", "2024-01-03 10:00:00", 1.0),
            # u2: only touch is 8 days before purchase -> no attribution
            (2, "click", "2024-01-01 00:00:00", 1.0),
            (2, "purchase", "2024-01-09 00:00:01", 1.0),
            # u3: touch after purchase only -> no attribution
            (3, "purchase", "2024-01-05 00:00:00", 1.0),
            (3, "click", "2024-01-06 00:00:00", 1.0),
        ],
    )
    rows = all_queries()["attribution_last_touch"](spark, str(tmp_path)).collect()
    assert len(rows) == 1
    r = rows[0]
    assert r["user_id"] == 1 and r["touch_type"] == "click"


def test_rolling_wau_counts_trailing_window(spark, tmp_path):
    """A user active on day d contributes to days d..d+6 (observed only)."""
    _events(
        spark,
        tmp_path,
        [
            (1, "view", "2024-01-01 10:00:00", 1.0),
            (2, "view", "2024-01-05 10:00:00", 1.0),
            (1, "view", "2024-01-20 10:00:00", 1.0),
        ],
    )
    rows = {
        str(r["day"]): r["wau"]
        for r in all_queries()["rolling_wau_7d"](spark, str(tmp_path)).collect()
    }
    # observed days only: Jan 1, Jan 5, Jan 20
    assert rows == {"2024-01-01": 1, "2024-01-05": 2, "2024-01-20": 1}


def test_rolling_wau_hll_matches_exact_within_tol(spark, sf_dir):
    """The merged-sketch estimate agrees with the exact rolling count
    on every day (within_tol all TRUE), and the exact counts equal the
    explode-rewrite query's."""
    hll = {
        str(r["day"]): r
        for r in all_queries()["rolling_wau_hll"](spark, sf_dir).collect()
    }
    exact = {
        str(r["day"]): r["wau"]
        for r in all_queries()["rolling_wau_7d"](spark, sf_dir).collect()
    }
    assert set(hll) == set(exact)
    for day, r in hll.items():
        assert r["exact_wau"] == exact[day]
        assert r["within_tol"] is True


def test_trend_slope_recovers_synthetic_line(spark, tmp_path):
    """value = 2*(day index) + 5 exactly -> slope 2, intercept 5 vs
    the 1970 epoch x-axis."""
    base = 19723  # 2024-01-01 as days since epoch
    _events(
        spark,
        tmp_path,
        [
            (1, "view", f"2024-01-0{d} 01:00:00", 2.0 * (base + d - 1) + 5.0)
            for d in range(1, 8)
        ],
    )
    rows = all_queries()["trend_slope_per_type"](spark, str(tmp_path)).collect()
    assert len(rows) == 1
    assert rows[0]["slope_per_day"] == 2.0
    assert rows[0]["intercept"] == 5.0


def test_anomaly_mad_catches_masked_outlier(spark, tmp_path):
    """One huge spike among tight values: the spike inflates stddev
    (masking the z-score) but not the median — MAD flags it."""
    base = [(1, "view", f"2024-01-01 10:{i:02d}:00", 10.0 + (i % 3) * 0.1) for i in range(40)]
    _events(spark, tmp_path, base + [(2, "view", "2024-01-02 10:00:00", 1000.0)])
    rows = all_queries()["anomaly_mad_events"](spark, str(tmp_path)).collect()
    assert [r["value"] for r in rows] == [1000.0]
    assert abs(rows[0]["robust_z"]) > 1000  # med 10.1, MAD 0.1


def test_association_rules_support_confidence_lift(spark, tmp_path):
    """6 baskets: {1,2} together 3x, 1 alone 3x -> conf(1=>2)=0.5,
    conf(2=>1)=1.0, identical lift both directions."""
    from pyspark.sql import Row

    baskets = [(1, [1, 2]), (2, [1, 2]), (3, [1, 2]), (4, [1]), (5, [1]), (6, [1])]
    spark.createDataFrame(
        [Row(l_orderkey=ok, l_partkey=pk) for ok, ps in baskets for pk in ps],
        "l_orderkey long, l_partkey long",
    ).write.parquet(str(tmp_path / "lineitem.parquet"))
    rows = {
        (r["antecedent"], r["consequent"]): r
        for r in all_queries()["basket_association_rules"](
            spark, str(tmp_path)
        ).collect()
    }
    assert set(rows) == {(1, 2), (2, 1)}
    assert rows[(1, 2)]["pair_count"] == 3
    assert rows[(1, 2)]["support"] == 0.5        # 3 of 6 baskets
    assert rows[(1, 2)]["confidence"] == 0.5     # 3 of 6 with item 1
    assert rows[(2, 1)]["confidence"] == 1.0     # 3 of 3 with item 2
    assert rows[(1, 2)]["lift"] == rows[(2, 1)]["lift"] == 1.0  # 6*3/(6*3)


def test_dow_seasonality_shares_sum_to_one(spark, sf_dir):
    """Per type: shares sum to 1, index averages ~1 across present
    days, and dow is ISO (1=Mon..7=Sun)."""
    rows = all_queries()["ts_dow_seasonality"](spark, sf_dir).collect()
    assert all(1 <= r["dow"] <= 7 for r in rows)
    by_type: dict[str, float] = {}
    for r in rows:
        by_type[r["event_type"]] = by_type.get(r["event_type"], 0.0) + r["share"]
    for t, s in by_type.items():
        assert abs(s - 1.0) < 1e-9, (t, s)


def test_dow_seasonality_iso_mapping(spark, tmp_path):
    """2024-01-01 was a Monday -> dow 1; 2024-01-07 a Sunday -> dow 7."""
    _events(
        spark,
        tmp_path,
        [
            (1, "view", "2024-01-01 10:00:00", 1.0),  # Monday
            (2, "view", "2024-01-07 10:00:00", 3.0),  # Sunday
        ],
    )
    rows = {
        r["dow"]: r
        for r in all_queries()["ts_dow_seasonality"](
            spark, str(tmp_path)
        ).collect()
    }
    assert set(rows) == {1, 7}
    assert rows[1]["dow_value"] == 1.0 and rows[7]["dow_value"] == 3.0
    assert rows[1]["share"] == 0.25 and rows[7]["share"] == 0.75


def test_trigram_search_ranks_true_match_first(spark, sf_dir):
    """'smal rign' (misspelled 'small ring') must rank an actual
    'small ring' part first."""
    rows = all_queries()["search_trigram_parts"](spark, sf_dir).collect()
    assert rows, "no candidates returned"
    assert rows[0]["p_name"] == "small ring"
    assert rows[0]["jaccard"] == max(r["jaccard"] for r in rows)

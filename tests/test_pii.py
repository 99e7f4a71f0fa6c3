"""PII detection/redaction contracts (operators/pii.py)."""

from __future__ import annotations

from pyspark.sql import functions as F

from flink_kakfa_spark.registry import all_queries


def test_redaction_leaves_no_matches(spark, sf_dir):
    """After redaction, every PII regex must find zero matches."""
    from flink_kakfa_spark.operators.pii import (
        EMAIL_RE,
        IPV4_RE,
        PHONE_RE,
        augmented_text,
        redact,
    )
    from flink_kakfa_spark.sources.tables import load_table

    d = load_table(spark, "documents", sf_dir)
    red = redact(augmented_text())
    residue = d.select(
        (
            F.regexp_count(red, F.lit(EMAIL_RE))
            + F.regexp_count(red, F.lit(PHONE_RE))
            + F.regexp_count(red, F.lit(IPV4_RE))
        ).alias("n")
    ).agg(F.sum("n").alias("total")).collect()[0]["total"]
    assert residue == 0


def test_injection_schedule_is_deterministic(spark, sf_dir):
    """doc_id 0 carries all three PII classes (0 ≡ 0 mod 3,5,7); a
    doc_id coprime to 3·5·7 carries none; counts match the schedule."""
    rows = {
        r["doc_id"]: r
        for r in all_queries()["pii_redact"](spark, sf_dir).collect()
    }
    assert (rows[0]["n_emails"], rows[0]["n_phones"], rows[0]["n_ips"]) == (1, 1, 1)
    # 1 is coprime to 3, 5, and 7 → clean doc, zero redactions
    assert rows[1]["n_pii"] == 0
    for did, r in rows.items():
        assert r["n_emails"] == (1 if did % 3 == 0 else 0)
        assert r["n_phones"] == (1 if did % 5 == 0 else 0)
        assert r["n_ips"] == (1 if did % 7 == 0 else 0)


def test_scan_stats_totals_match_per_doc(spark, sf_dir):
    """The per-source rollup must sum exactly to the per-doc counts."""
    per_doc = all_queries()["pii_redact"](spark, sf_dir)
    stats = all_queries()["pii_scan_stats"](spark, sf_dir)
    total_docs = per_doc.count()
    agg = stats.agg(
        F.sum("n_docs").alias("docs"),
        F.sum("total_emails").alias("e"),
        F.sum("total_phones").alias("p"),
        F.sum("total_ips").alias("i"),
    ).collect()[0]
    ref = per_doc.agg(
        F.sum("n_emails").alias("e"),
        F.sum("n_phones").alias("p"),
        F.sum("n_ips").alias("i"),
    ).collect()[0]
    assert agg["docs"] == total_docs
    assert (agg["e"], agg["p"], agg["i"]) == (ref["e"], ref["p"], ref["i"])


def test_pii_redact_plan_is_shuffle_free(spark, sf_dir):
    """Scale posture: redaction is a narrow map — zero Exchange."""
    df = all_queries()["pii_redact"](spark, sf_dir)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan, plan

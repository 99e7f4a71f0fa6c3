"""PII detection and redaction for LLM training-data pipelines.

A production corpus pipeline must strip emails, phone numbers, and IP
addresses before training (the standard scrub pass in public pipelines
such as C4/The Pile preprocessing). Both queries run the full scan +
redact logic over ``documents``; because the synthetic fixture corpus
contains no digits at all, each query first *augments* the text with
deterministic, doc_id-derived PII spans (identically on the Spark and
oracle sides) so the regex machinery is exercised against known truth.

Scale notes (100 TB): detection and redaction are per-row narrow maps
over built-in ``regexp_count`` / ``regexp_replace`` — JVM-codegen'd,
zero shuffle, Python-free. ``pii_scan_stats`` adds one small
digest-only aggregation keyed by ``source`` (20 groups); the text
itself never shuffles. The regexes are RE2-safe (no backtracking
blowup: no lookaround, no backreferences), so worst-case scan cost is
linear in corpus bytes — the property you need before pointing a regex
at 100 TB.

Reference parity: the reference has no PII handling (it is a Kafka
produce/consume demo, go/producer/producer.go); this module is part of
the Tier C LLM-pipeline mandate (BASELINE.json:6).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from flink_kakfa_spark.registry import query
from flink_kakfa_spark.sources.tables import load_table

# Shared Java-regex/RE2-compatible patterns (no lookaround, no
# backreferences — both engines run them with linear-time semantics).
EMAIL_RE = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
PHONE_RE = r"\b\d{3}-\d{3}-\d{4}\b"
IPV4_RE = r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b"


def augmented_text() -> Column:
    """documents.text + deterministic synthetic PII spans.

    doc_id % 3 == 0 → an email, % 5 == 0 → a US-style phone number,
    % 7 == 0 → an IPv4 address. The fixture text has no digits, so
    every regex match in the augmented corpus is attributable.
    """
    did = F.col("doc_id")
    return F.concat(
        F.col("text"),
        F.when(
            did % 3 == 0,
            F.concat(F.lit(" contact user"), did.cast("string"), F.lit("@example.org")),
        ).otherwise(F.lit("")),
        F.when(
            did % 5 == 0,
            F.concat(
                F.lit(" call 555-014-"),
                F.lpad((did % 10000).cast("string"), 4, "0"),
            ),
        ).otherwise(F.lit("")),
        F.when(
            did % 7 == 0,
            F.concat(F.lit(" host 10."), (did % 256).cast("string"), F.lit(".0.42")),
        ).otherwise(F.lit("")),
    )


# The same augmentation as ANSI SQL for the DuckDB oracle.
_SQL_AUG = """
  text
  || CASE WHEN doc_id % 3 = 0
          THEN ' contact user' || CAST(doc_id AS VARCHAR) || '@example.org'
          ELSE '' END
  || CASE WHEN doc_id % 5 = 0
          THEN ' call 555-014-' || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0')
          ELSE '' END
  || CASE WHEN doc_id % 7 = 0
          THEN ' host 10.' || CAST(doc_id % 256 AS VARCHAR) || '.0.42'
          ELSE '' END
"""


def redact(col: Column) -> Column:
    """Replace every email/phone/IPv4 span with a typed placeholder.

    Email first: its char class can contain digits/dots, so stripping
    it first keeps the narrower numeric patterns from matching inside
    an address. Spark's ``regexp_replace`` is replace-all by default
    (DuckDB needs the explicit ``'g'`` flag — mirrored in the oracles).
    """
    red = F.regexp_replace(col, EMAIL_RE, "<EMAIL>")
    red = F.regexp_replace(red, PHONE_RE, "<PHONE>")
    return F.regexp_replace(red, IPV4_RE, "<IP>")


@query(
    "pii_redact",
    oracle=f"""
    SELECT
      doc_id,
      len(regexp_extract_all(aug, '{EMAIL_RE}')) AS n_emails,
      len(regexp_extract_all(aug, '{PHONE_RE}')) AS n_phones,
      len(regexp_extract_all(aug, '{IPV4_RE}')) AS n_ips,
      len(regexp_extract_all(aug, '{EMAIL_RE}'))
        + len(regexp_extract_all(aug, '{PHONE_RE}'))
        + len(regexp_extract_all(aug, '{IPV4_RE}')) AS n_pii,
      length(
        regexp_replace(
          regexp_replace(
            regexp_replace(aug, '{EMAIL_RE}', '<EMAIL>', 'g'),
            '{PHONE_RE}', '<PHONE>', 'g'),
          '{IPV4_RE}', '<IP>', 'g')
      ) AS redacted_len,
      md5(
        regexp_replace(
          regexp_replace(
            regexp_replace(aug, '{EMAIL_RE}', '<EMAIL>', 'g'),
            '{PHONE_RE}', '<PHONE>', 'g'),
          '{IPV4_RE}', '<IP>', 'g')
      ) AS redacted_md5
    FROM (SELECT doc_id, {_SQL_AUG} AS aug FROM documents)
    """,
)
def q_pii_redact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document PII inventory + redacted output (md5-fingerprinted).

    One narrow pass: count each PII class, then emit the redacted
    text's length and md5 so the oracle proves the rewritten bytes are
    identical — not merely the counts.
    """
    d = load_table(spark, "documents", sf_dir)
    aug = augmented_text()
    red = redact(aug)
    n_emails = F.regexp_count(aug, F.lit(EMAIL_RE))
    n_phones = F.regexp_count(aug, F.lit(PHONE_RE))
    n_ips = F.regexp_count(aug, F.lit(IPV4_RE))
    return d.select(
        "doc_id",
        n_emails.alias("n_emails"),
        n_phones.alias("n_phones"),
        n_ips.alias("n_ips"),
        (n_emails + n_phones + n_ips).alias("n_pii"),
        F.length(red).alias("redacted_len"),
        F.md5(red).alias("redacted_md5"),
    )


@query(
    "pii_scan_stats",
    oracle=f"""
    SELECT
      source,
      COUNT(*) AS n_docs,
      CAST(SUM(CASE WHEN n_doc_pii > 0 THEN 1 ELSE 0 END) AS BIGINT)
        AS docs_with_pii,
      CAST(SUM(n_doc_emails) AS BIGINT) AS total_emails,
      CAST(SUM(n_doc_phones) AS BIGINT) AS total_phones,
      CAST(SUM(n_doc_ips) AS BIGINT) AS total_ips,
      CAST(SUM(CASE WHEN n_doc_pii > 0 THEN 1 ELSE 0 END) AS DOUBLE)
        / COUNT(*) AS pii_doc_rate
    FROM (
      SELECT
        source,
        len(regexp_extract_all(aug, '{EMAIL_RE}')) AS n_doc_emails,
        len(regexp_extract_all(aug, '{PHONE_RE}')) AS n_doc_phones,
        len(regexp_extract_all(aug, '{IPV4_RE}')) AS n_doc_ips,
        len(regexp_extract_all(aug, '{EMAIL_RE}'))
          + len(regexp_extract_all(aug, '{PHONE_RE}'))
          + len(regexp_extract_all(aug, '{IPV4_RE}')) AS n_doc_pii
      FROM (SELECT source, {_SQL_AUG} AS aug FROM documents)
    )
    GROUP BY source
    """,
)
def q_pii_scan_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-level PII audit: per-source incidence and class totals.

    The report a pipeline owner reads before deciding whether a source
    needs the redact pass at all. Narrow per-doc counts, then one
    digest-only shuffle of 6 integers per source — the full text never
    crosses the wire.
    """
    d = load_table(spark, "documents", sf_dir)
    aug = augmented_text()
    n_emails = F.regexp_count(aug, F.lit(EMAIL_RE))
    n_phones = F.regexp_count(aug, F.lit(PHONE_RE))
    n_ips = F.regexp_count(aug, F.lit(IPV4_RE))
    per_doc = d.select(
        "source",
        n_emails.alias("n_doc_emails"),
        n_phones.alias("n_doc_phones"),
        n_ips.alias("n_doc_ips"),
        (n_emails + n_phones + n_ips).alias("n_doc_pii"),
    )
    return per_doc.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(F.when(F.col("n_doc_pii") > 0, 1).otherwise(0)).alias("docs_with_pii"),
        F.sum("n_doc_emails").alias("total_emails"),
        F.sum("n_doc_phones").alias("total_phones"),
        F.sum("n_doc_ips").alias("total_ips"),
        (
            F.sum(F.when(F.col("n_doc_pii") > 0, 1).otherwise(0)).cast("double")
            / F.count(F.lit(1))
        ).alias("pii_doc_rate"),
    )

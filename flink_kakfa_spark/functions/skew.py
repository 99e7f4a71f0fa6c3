"""Skew mitigation: salted two-stage aggregation (SURVEY.md §4 /
driver mandate "salting for skew").

AQE's skew-join splitting handles skewed *joins* automatically; skewed
*aggregation* keys (one word carrying 30% of a 100 TB corpus) still
funnel into a single reducer under plain groupBy when a key's partial
aggregate stream overwhelms one task. Salting splits each hot key into
``n_salts`` synthetic subkeys, aggregates the subkeys in parallel, then
combines — two small shuffles instead of one skewed one.

Correct only for algebraic aggregates (count/sum/min/max); the helper
exposes exactly those.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def salted_count(df: DataFrame, key: str, n_salts: int = 16, out: str = "cnt") -> DataFrame:
    """groupBy(key).count() with salt-split pre-aggregation."""
    salted = df.withColumn("_salt", F.pmod(F.spark_partition_id() + F.monotonically_increasing_id(), F.lit(n_salts)))
    partial = salted.groupBy(key, "_salt").agg(F.count(F.lit(1)).alias("_c"))
    return partial.groupBy(key).agg(F.sum("_c").alias(out))


def salted_agg(
    df: DataFrame,
    key: str,
    value: Column,
    n_salts: int = 16,
    out: str = "total",
) -> DataFrame:
    """groupBy(key).sum(value) (decimal-exact) with salt-split stages."""
    salted = df.withColumn("_salt", F.pmod(F.spark_partition_id() + F.monotonically_increasing_id(), F.lit(n_salts)))
    partial = salted.groupBy(key, "_salt").agg(
        F.sum(value.cast("decimal(18,4)")).alias("_s")
    )
    return partial.groupBy(key).agg(F.sum("_s").cast("double").alias(out))


def salted_join(
    fact: DataFrame,
    dim: DataFrame,
    fact_key: str,
    dim_key: str,
    n_salts: int = 8,
) -> DataFrame:
    """Equi-join with the fact side's hot keys salt-split ``n_salts`` ways.

    A skewed join key (one order carrying millions of line items, one
    user carrying a third of all events) funnels every matching fact
    row into a single shuffle partition under a plain sort-merge join.
    Salting spreads each fact key across ``n_salts`` subpartitions —
    the salt varies WITHIN a key (partition id + row id), unlike
    aggregation salting where any spread works — and replicates each
    dim row once per salt so every fact row still finds its match.
    Shuffle cost: fact unchanged, dim × ``n_salts`` (dim is the
    smaller side by assumption). AQE's skew-join split handles the
    common cases automatically; this is the explicit form for when AQE
    is off or the skew is within a single key's sort-merge buffer.

    The result is exactly the plain inner equi-join (salt columns are
    dropped); callers' aggregates are unaffected.
    """
    salted = fact.withColumn(
        "_fsalt",
        F.pmod(F.spark_partition_id() + F.monotonically_increasing_id(), F.lit(n_salts)),
    )
    replicated = dim.withColumn(
        "_dsalt", F.explode(F.array(*[F.lit(i) for i in range(n_salts)]))
    )
    joined = salted.join(
        replicated,
        (salted[fact_key] == replicated[dim_key])
        & (salted["_fsalt"] == replicated["_dsalt"]),
    )
    return joined.drop("_fsalt", "_dsalt")

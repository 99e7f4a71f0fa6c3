"""The SQL entry path (SURVEY.md §3.4): queries submitted as SQL text.

Everything else in the engine declares plans via the DataFrame API;
this module exercises the other half of the user surface —
``spark.sql`` over registered views — with SQL features that have no
direct single-method DataFrame equivalent: CTEs, correlated EXISTS,
scalar subqueries, GROUPING SETS, HAVING, PIVOT, QUALIFY-style
ranked-filter subqueries. Catalyst compiles both surfaces to the same
logical plans, so these also certify parser/analyzer behavior.

Scale notes: identical physical plans to the DataFrame forms — SQL
text changes nothing about execution.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from flink_kakfa_spark.registry import query
from flink_kakfa_spark.sources.tables import load_table


def _sql(spark: SparkSession, sf_dir: str, tables: list[str], text: str) -> DataFrame:
    for t in tables:
        load_table(spark, t, sf_dir).createOrReplaceTempView(t)
    return spark.sql(text)


@query(
    "sql_cte_top_nations",
    oracle="""
    WITH nation_orders AS (
      SELECT c.c_nationkey, COUNT(*) AS n_orders
      FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
      GROUP BY c.c_nationkey
    )
    SELECT n.n_name, no.n_orders
    FROM nation_orders no JOIN nation n ON no.c_nationkey = n.n_nationkey
    ORDER BY no.n_orders DESC, n.n_name ASC
    LIMIT 5
    """,
)
def q_sql_cte_top_nations(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CTE + join + top-k, submitted as SQL text."""
    return _sql(
        spark,
        sf_dir,
        ["orders", "customer", "nation"],
        """
        WITH nation_orders AS (
          SELECT c.c_nationkey, COUNT(*) AS n_orders
          FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
          GROUP BY c.c_nationkey
        )
        SELECT n.n_name, no.n_orders
        FROM nation_orders no JOIN nation n ON no.c_nationkey = n.n_nationkey
        ORDER BY no.n_orders DESC, n.n_name ASC
        LIMIT 5
        """,
    )


@query(
    "sql_grouping_sets",
    oracle="""
    SELECT l_returnflag, l_linestatus, COUNT(*) AS n
    FROM lineitem
    GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), (l_returnflag, l_linestatus))
    """,
)
def q_sql_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A5: explicit GROUPING SETS (neither pure rollup nor cube)."""
    return _sql(
        spark,
        sf_dir,
        ["lineitem"],
        """
        SELECT l_returnflag, l_linestatus, COUNT(*) AS n
        FROM lineitem
        GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), (l_returnflag, l_linestatus))
        """,
    )


@query(
    "sql_having_scalar_subquery",
    oracle="""
    SELECT o_custkey, COUNT(*) AS n_orders, CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE) AS spend
    FROM orders
    GROUP BY o_custkey
    HAVING CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE) >
           (SELECT CAST(CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE) / COUNT(DISTINCT o_custkey) AS DOUBLE) * 2
            FROM orders)
    """,
)
def q_sql_having_scalar_subquery(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HAVING with an uncorrelated scalar subquery (2x the mean spend)."""
    return _sql(
        spark,
        sf_dir,
        ["orders"],
        """
        SELECT o_custkey, COUNT(*) AS n_orders, CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE) AS spend
        FROM orders
        GROUP BY o_custkey
        HAVING CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE) >
               (SELECT CAST(CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE) / COUNT(DISTINCT o_custkey) AS DOUBLE) * 2
                FROM orders)
        """,
    )


@query(
    "sql_correlated_exists",
    oracle="""
    SELECT s.s_suppkey, s.s_name
    FROM supplier s
    WHERE EXISTS (
      SELECT 1 FROM lineitem l
      WHERE l.l_suppkey = s.s_suppkey AND l.l_quantity >= 49
    )
    """,
)
def q_sql_correlated_exists(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated EXISTS — planned as a left-semi join by Catalyst."""
    return _sql(
        spark,
        sf_dir,
        ["supplier", "lineitem"],
        """
        SELECT s.s_suppkey, s.s_name
        FROM supplier s
        WHERE EXISTS (
          SELECT 1 FROM lineitem l
          WHERE l.l_suppkey = s.s_suppkey AND l.l_quantity >= 49
        )
        """,
    )


@query(
    "sql_pivot_status_by_priority",
    oracle="""
    SELECT
      o_orderpriority,
      COUNT(CASE WHEN o_orderstatus = 'O' THEN 1 END) AS status_o,
      COUNT(CASE WHEN o_orderstatus = 'F' THEN 1 END) AS status_f,
      COUNT(CASE WHEN o_orderstatus = 'P' THEN 1 END) AS status_p
    FROM orders
    GROUP BY o_orderpriority
    """,
)
def q_sql_pivot_status_by_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PIVOT: order counts, status values widened into columns."""
    return _sql(
        spark,
        sf_dir,
        ["orders"],
        """
        SELECT * FROM (
          SELECT o_orderpriority, o_orderstatus FROM orders
        )
        PIVOT (
          COUNT(1) FOR o_orderstatus IN ('O' AS status_o, 'F' AS status_f, 'P' AS status_p)
        )
        """,
    )


@query(
    "sql_ranked_subquery_filter",
    oracle="""
    SELECT c_mktsegment, c_custkey, c_acctbal FROM (
      SELECT c_mktsegment, c_custkey, c_acctbal,
             ROW_NUMBER() OVER (PARTITION BY c_mktsegment
                                ORDER BY c_acctbal DESC, c_custkey ASC) AS rk
      FROM customer
    ) WHERE rk = 1
    """,
)
def q_sql_ranked_subquery_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """QUALIFY-style richest-customer-per-segment via ranked subquery."""
    return _sql(
        spark,
        sf_dir,
        ["customer"],
        """
        SELECT c_mktsegment, c_custkey, c_acctbal FROM (
          SELECT c_mktsegment, c_custkey, c_acctbal,
                 ROW_NUMBER() OVER (PARTITION BY c_mktsegment
                                    ORDER BY c_acctbal DESC, c_custkey ASC) AS rk
          FROM customer
        ) WHERE rk = 1
        """,
    )


@query(
    "sql_in_subquery_not_in",
    oracle="""
    SELECT p_partkey, p_brand
    FROM part
    WHERE p_partkey IN (SELECT l_partkey FROM lineitem WHERE l_quantity >= 49)
      AND p_partkey NOT IN (SELECT l_partkey FROM lineitem WHERE l_discount >= 0.1)
    """,
)
def q_sql_in_subquery_not_in(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IN / NOT IN subqueries — semi + anti join plans from SQL text."""
    return _sql(
        spark,
        sf_dir,
        ["part", "lineitem"],
        """
        SELECT p_partkey, p_brand
        FROM part
        WHERE p_partkey IN (SELECT l_partkey FROM lineitem WHERE l_quantity >= 49)
          AND p_partkey NOT IN (SELECT l_partkey FROM lineitem WHERE l_discount >= 0.1)
        """,
    )


@query(
    "sql_lateral_posexplode",
    oracle="""
    WITH tok AS (
      SELECT doc_id, string_split(text, ' ') AS ts
      FROM documents WHERE doc_id % 100 = 0
    )
    SELECT doc_id, CAST(i - 1 AS INTEGER) AS pos, ts[i] AS word
    FROM tok, UNNEST(generate_series(1, len(ts))) AS s(i)
    WHERE ts[i] <> ''
    """,
)
def q_sql_lateral_posexplode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LATERAL VIEW posexplode: positional tokenization (UDTF surface)."""
    return _sql(
        spark,
        sf_dir,
        ["documents"],
        """
        SELECT doc_id, pos, word
        FROM documents
        LATERAL VIEW posexplode(split(text, ' ')) t AS pos, word
        WHERE doc_id % 100 = 0 AND word <> ''
        """,
    )


@query(
    "sql_star_except",
    oracle="""
    SELECT * EXCLUDE (o_totalprice, o_orderpriority)
    FROM orders
    WHERE o_orderstatus = 'F'
    ORDER BY o_orderkey
    LIMIT 20
    """,
)
def q_sql_star_except(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``SELECT * EXCEPT (...)`` — the wide-table projection idiom
    (drop a few columns from a 100-column table without naming the
    other 97). Spark 4 spells it EXCEPT, DuckDB spells it EXCLUDE;
    the resolved projection is identical, and column pruning still
    reaches the scan (only the surviving columns are read).
    """
    load_table(spark, "orders", sf_dir).createOrReplaceTempView("orders")
    return spark.sql(
        """
        SELECT * EXCEPT (o_totalprice, o_orderpriority)
        FROM orders
        WHERE o_orderstatus = 'F'
        ORDER BY o_orderkey
        LIMIT 20
        """
    )

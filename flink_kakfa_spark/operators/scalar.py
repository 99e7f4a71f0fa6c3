"""Scalar function families (SURVEY.md §2.7): string, date/time, math,
conditional, array, JSON, cast.

Tier A/B anchors in the reference: space-join tokenization
(``go/producer/producer.go:137``), ``fmt.Sprintf`` key formatting
(``go/producer/producer.go:119``), unix timestamps (same line),
duration parsing (``go/producer/config.go:75``), JSON config decode
(``go/producer/config.go:58-64``). Tier C broadens each family over
the fixtures.

All functions here are built-in Spark SQL expressions — JVM-side,
inside whole-stage codegen, zero Python in the data path.

Determinism vs the oracle: no ROUND on tie-prone doubles (half-up vs
half-even), no libm functions (pow/log ulp drift); sqrt is IEEE-exact,
integer math is exact, string/date functions are exact.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from flink_kakfa_spark.registry import query
from flink_kakfa_spark.sources.tables import load_table


@query(
    "scalar_string_funcs",
    oracle=r"""
    SELECT
      p_partkey,
      UPPER(p_brand) AS brand_upper,
      LOWER(p_type) AS type_lower,
      LENGTH(p_name) AS name_len,
      SUBSTRING(p_type, 1, 4) AS type_prefix,
      CONCAT(p_brand, '/', p_type) AS brand_type,
      TRIM(CONCAT('  ', p_name, '  ')) AS name_trim,
      CAST(regexp_extract(p_brand, '(\d+)', 1) AS INTEGER) AS brand_num,
      regexp_replace(p_name, '[aeiou]', '_', 'g') AS name_devoweled,
      CASE WHEN p_type LIKE 'ECO%' THEN 1 ELSE 0 END AS is_economy
    FROM part
    """,
)
def q_scalar_string_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """String family: case, length, substring, concat, trim, regexp, like."""
    p = load_table(spark, "part", sf_dir)
    return p.select(
        "p_partkey",
        F.upper("p_brand").alias("brand_upper"),
        F.lower("p_type").alias("type_lower"),
        F.length("p_name").alias("name_len"),
        F.substring("p_type", 1, 4).alias("type_prefix"),
        F.concat(F.col("p_brand"), F.lit("/"), F.col("p_type")).alias("brand_type"),
        F.trim(F.concat(F.lit("  "), F.col("p_name"), F.lit("  "))).alias("name_trim"),
        F.regexp_extract("p_brand", r"(\d+)", 1).cast("int").alias("brand_num"),
        F.regexp_replace("p_name", "[aeiou]", "_").alias("name_devoweled"),
        F.when(F.col("p_type").like("ECO%"), 1).otherwise(0).alias("is_economy"),
    )


@query(
    "scalar_date_funcs",
    oracle="""
    SELECT
      o_orderkey,
      CAST(year(o_orderdate) AS INT) AS order_year,
      CAST(month(o_orderdate) AS INT) AS order_month,
      CAST(dayofmonth(o_orderdate) AS INT) AS order_day,
      CAST(date_trunc('month', o_orderdate) AS TIMESTAMP) AS month_start,
      strftime(o_orderdate, '%Y-%m') AS ym,
      CAST(date_diff('day', o_orderdate, TIMESTAMP '2002-01-01') AS INT) AS days_to_2002,
      o_orderdate + INTERVAL 30 DAY AS due_date,
      CAST(epoch(o_orderdate) AS BIGINT) AS unix_ts
    FROM orders
    """,
)
def q_scalar_date_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Date/time family: extract, trunc, format, diff, interval, epoch.

    ``unix_ts`` is the engine twin of the reference's message-key
    convention ``"key-" + unix-seconds`` (``go/producer/producer.go:119``).
    """
    o = load_table(spark, "orders", sf_dir)
    return o.select(
        "o_orderkey",
        F.year("o_orderdate").alias("order_year"),
        F.month("o_orderdate").alias("order_month"),
        F.dayofmonth("o_orderdate").alias("order_day"),
        F.date_trunc("month", "o_orderdate").alias("month_start"),
        F.date_format("o_orderdate", "yyyy-MM").alias("ym"),
        F.datediff(F.lit("2002-01-01").cast("timestamp"), F.col("o_orderdate")).alias("days_to_2002"),
        (F.col("o_orderdate") + F.expr("INTERVAL 30 DAYS")).alias("due_date"),
        F.unix_timestamp("o_orderdate").alias("unix_ts"),
    )


@query(
    "scalar_math_funcs",
    oracle="""
    SELECT
      l_orderkey,
      l_linenumber,
      ABS(l_extendedprice - 30000.0) AS dist_from_30k,
      CAST(FLOOR(l_extendedprice / 1000.0) AS BIGINT) AS price_bucket,
      CAST(CEIL(l_quantity / 10.0) AS BIGINT) AS qty_bucket,
      SQRT(l_quantity) AS qty_sqrt,
      CAST(l_orderkey % 7 AS BIGINT) AS key_mod,
      GREATEST(l_discount, l_tax) AS max_rate,
      LEAST(l_discount, l_tax) AS min_rate
    FROM lineitem
    WHERE l_orderkey % 100 = 0
    """,
)
def q_scalar_math_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Math family: abs/floor/ceil/sqrt/mod/greatest/least (all IEEE-exact)."""
    li = load_table(spark, "lineitem", sf_dir)
    return li.filter(F.col("l_orderkey") % 100 == 0).select(
        "l_orderkey",
        "l_linenumber",
        F.abs(F.col("l_extendedprice") - 30000.0).alias("dist_from_30k"),
        F.floor(F.col("l_extendedprice") / 1000.0).alias("price_bucket"),
        F.ceil(F.col("l_quantity") / 10.0).alias("qty_bucket"),
        F.sqrt("l_quantity").alias("qty_sqrt"),
        (F.col("l_orderkey") % 7).alias("key_mod"),
        F.greatest("l_discount", "l_tax").alias("max_rate"),
        F.least("l_discount", "l_tax").alias("min_rate"),
    )


@query(
    "scalar_conditional_funcs",
    oracle="""
    SELECT
      price_tier,
      COUNT(*) AS n,
      COUNT(DISTINCT o_custkey) AS n_cust
    FROM (
      SELECT
        o_custkey,
        CASE
          WHEN o_totalprice >= 300000 THEN 'platinum'
          WHEN o_totalprice >= 150000 THEN 'gold'
          WHEN o_totalprice >= 50000  THEN 'silver'
          ELSE 'bronze'
        END AS price_tier
      FROM orders
    )
    GROUP BY price_tier
    """,
)
def q_scalar_conditional_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Conditional family: multi-branch CASE driving an aggregation."""
    o = load_table(spark, "orders", sf_dir)
    tier = (
        F.when(F.col("o_totalprice") >= 300000, "platinum")
        .when(F.col("o_totalprice") >= 150000, "gold")
        .when(F.col("o_totalprice") >= 50000, "silver")
        .otherwise("bronze")
    )
    return (
        o.select("o_custkey", tier.alias("price_tier"))
        .groupBy("price_tier")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.countDistinct("o_custkey").alias("n_cust"),
        )
    )


@query(
    "scalar_array_funcs",
    oracle="""
    SELECT
      doc_id,
      len(string_split(text, ' ')) AS n_tokens,
      len(list_distinct(string_split(text, ' '))) AS n_uniq,
      list_contains(string_split(text, ' '), 'data') AS has_data,
      string_split(text, ' ')[1] AS first_token,
      array_to_string(list_sort(list_distinct(string_split(text, ' ')))[1:3], '|') AS first3_sorted
    FROM documents
    """,
)
def q_scalar_array_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Array family: size, distinct, contains, indexing, sort, slice."""
    d = load_table(spark, "documents", sf_dir)
    toks = F.split(F.col("text"), " ")
    return d.select(
        "doc_id",
        F.size(toks).alias("n_tokens"),
        F.size(F.array_distinct(toks)).alias("n_uniq"),
        F.array_contains(toks, "data").alias("has_data"),
        F.element_at(toks, 1).alias("first_token"),
        F.array_join(F.slice(F.sort_array(F.array_distinct(toks)), 1, 3), "|").alias("first3_sorted"),
    )


@query(
    "scalar_json_extract",
    oracle="""
    SELECT
      event_type,
      CAST(SUM(CAST(regexp_extract(props, '"k": (\\d+)', 1) AS BIGINT))
           AS BIGINT) AS sum_k,
      COUNT(*) AS n
    FROM events
    GROUP BY event_type
    """,
)
def q_scalar_json_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E5/JSON family: typed field extraction from events.props.

    Spark side uses real JSON path extraction (``get_json_object``);
    the oracle reproduces the value by regex so it needs no DuckDB
    JSON extension. Twin of the reference's ``json.Unmarshal`` config
    decode (``go/producer/config.go:58-64``), applied to data.
    """
    e = load_table(spark, "events", sf_dir)
    return (
        e.select(
            "event_type",
            F.get_json_object("props", "$.k").cast("bigint").alias("k"),
        )
        .groupBy("event_type")
        .agg(F.sum("k").alias("sum_k"), F.count(F.lit(1)).alias("n"))
    )


@query(
    "scalar_cast_funcs",
    oracle="""
    SELECT
      l_orderkey,
      CAST(l_quantity AS INTEGER) AS qty_int,
      CAST(l_quantity AS VARCHAR) AS qty_str,
      CAST(CAST(l_orderkey AS VARCHAR) AS BIGINT) AS key_roundtrip,
      CAST(l_shipdate AS DATE) AS ship_day,
      CAST(l_returnflag = 'R' AS INTEGER) AS is_returned
    FROM lineitem
    WHERE l_orderkey % 500 = 0
    """,
)
def q_scalar_cast_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cast family: numeric↔string↔date↔bool round-trips.

    Twin of the consumer's ``string(message.Value)`` byte→string decode
    (``go/consumer/consumer.go:80``).
    """
    li = load_table(spark, "lineitem", sf_dir)
    return li.filter(F.col("l_orderkey") % 500 == 0).select(
        "l_orderkey",
        F.col("l_quantity").cast("int").alias("qty_int"),
        F.col("l_quantity").cast("string").alias("qty_str"),
        F.col("l_orderkey").cast("string").cast("bigint").alias("key_roundtrip"),
        F.col("l_shipdate").cast("date").alias("ship_day"),
        (F.col("l_returnflag") == "R").cast("int").alias("is_returned"),
    )


@query(
    "reference_message_shape",
    oracle="""
    SELECT
      'key-' || CAST(CAST(epoch(o_orderdate) AS BIGINT) AS VARCHAR) AS key,
      o_orderpriority AS value,
      COUNT(*) AS n
    FROM orders
    WHERE o_orderkey % 50 = 0
    GROUP BY 1, 2
    """,
)
def q_reference_message_shape(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P2 parity: rows shaped into the reference's Kafka message contract.

    The reference derives each message key as "key-" + unix-seconds
    (``go/producer/producer.go:118-123``) — note the key is
    timestamp-derived and NOT unique per record, so distinct rows can
    share a key; the group-by documents exactly that collision
    behavior.
    """
    o = load_table(spark, "orders", sf_dir)
    return (
        o.filter(F.col("o_orderkey") % 50 == 0)
        .select(
            F.concat(
                F.lit("key-"), F.unix_timestamp("o_orderdate").cast("string")
            ).alias("key"),
            F.col("o_orderpriority").alias("value"),
        )
        .groupBy("key", "value")
        .agg(F.count(F.lit(1)).alias("n"))
    )


@query(
    "scalar_from_json_struct",
    oracle="""
    SELECT
      event_id,
      CAST(regexp_extract(props, '"k": (\\d+)', 1) AS INTEGER) AS k,
      CAST(regexp_extract(props, '"k": (\\d+)', 1) AS INTEGER) % 10 AS k_bucket
    FROM events
    WHERE event_id % 200 = 0
    """,
)
def q_scalar_from_json_struct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E5: schema-full JSON parsing (from_json to a typed struct).

    ``get_json_object`` (see scalar_json_extract) is the per-path form;
    ``from_json`` parses once into a struct — the right call shape when
    extracting many fields at 100 TB.
    """
    e = load_table(spark, "events", sf_dir)
    parsed = e.filter(F.col("event_id") % 200 == 0).select(
        "event_id", F.from_json("props", "k INT").alias("p")
    )
    return parsed.select(
        "event_id",
        F.col("p.k").alias("k"),
        (F.col("p.k") % 10).alias("k_bucket"),
    )


@query(
    "scalar_date_funcs2",
    oracle="""
    SELECT
      o_orderkey,
      CAST(isodow(o_orderdate) AS INT) AS iso_weekday,
      CAST(weekofyear(o_orderdate) AS INT) AS iso_week,
      CAST(quarter(o_orderdate) AS INT) AS q,
      CAST(last_day(o_orderdate) AS DATE) AS month_end,
      CAST(o_orderdate + INTERVAL 2 MONTH AS DATE) AS plus_2_months,
      CAST(date_trunc('week', o_orderdate) AS DATE) AS week_start
    FROM orders
    WHERE o_orderkey % 100 = 0
    """,
)
def q_scalar_date_funcs2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Date family 2: ISO weekday/week, quarter, month-end, add_months.

    Calendar-convention traps handled explicitly: Spark weekday() is
    Monday=0 (DuckDB isodow Monday=1, hence +1); both weekofyear are ISO.
    """
    o = load_table(spark, "orders", sf_dir).filter(F.col("o_orderkey") % 100 == 0)
    return o.select(
        "o_orderkey",
        (F.weekday("o_orderdate") + 1).alias("iso_weekday"),
        F.weekofyear("o_orderdate").alias("iso_week"),
        F.quarter("o_orderdate").alias("q"),
        F.last_day("o_orderdate").alias("month_end"),
        F.add_months("o_orderdate", 2).alias("plus_2_months"),
        F.date_trunc("week", "o_orderdate").cast("date").alias("week_start"),
    )


@query(
    "scalar_map_funcs",
    oracle="""
    SELECT
      l_returnflag,
      l_linestatus,
      CONCAT('flag=', l_returnflag, ',status=', l_linestatus) AS tags_str,
      2 AS n_tags
    FROM lineitem
    WHERE l_orderkey % 1000 = 0
    """,
)
def q_scalar_map_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Map family: build a map column, then serialize it canonically.

    The map itself (MapType) exercises map_from_arrays / map_keys /
    map_values; the output is flattened to sorted key=value text so the
    oracle comparison is type-agnostic.
    """
    li = load_table(spark, "lineitem", sf_dir).filter(F.col("l_orderkey") % 1000 == 0)
    m = F.create_map(
        F.lit("flag"), F.col("l_returnflag"), F.lit("status"), F.col("l_linestatus")
    )
    tags = F.map_from_arrays(F.map_keys(m), F.map_values(m))  # rebuild round-trip
    return li.select(
        "l_returnflag",
        "l_linestatus",
        F.concat_ws(
            ",",
            F.transform(
                F.sort_array(F.map_keys(tags)),
                lambda k: F.concat(k, F.lit("="), F.element_at(tags, k)),
            ),
        ).alias("tags_str"),
        F.size(tags).alias("n_tags"),
    )

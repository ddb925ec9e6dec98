"""Scalar-function surface (SURVEY.md §2.8): string, date/time, math,
array + higher-order, JSON, hashing, explode/unnest.

Cross-engine hazards handled here: datediff argument order (Spark
``datediff(end, start)`` vs DuckDB ``date_diff(part, start, end)``),
decimal-literal typing, regex dialect (kept to the common subset),
list-function naming (Spark ``array_*`` vs DuckDB ``list_*``).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from security_master_spark.datasets import load_table
from security_master_spark.functions.rounding import dround, sql_dround
from security_master_spark.plans.registry import register


@register(
    "s1_string_functions",
    oracle="""
    SELECT c_custkey,
           UPPER(c_name)                       AS name_upper,
           LOWER(c_mktsegment)                 AS seg_lower,
           SUBSTRING(c_name, 1, 8)             AS name_prefix,
           LENGTH(c_name)                      AS name_len,
           TRIM(CONCAT('  ', c_name, '  '))    AS name_trim,
           CONCAT_WS('|', c_mktsegment, c_name) AS seg_name,
           LPAD(CAST(c_custkey AS VARCHAR), 10, '0') AS key_padded,
           REPLACE(c_name, '#', '-')           AS name_dashed,
           CONTAINS(c_name, '1')               AS has_one,
           STARTS_WITH(c_name, 'Customer')     AS is_customer
    FROM customer
    WHERE c_custkey <= 600
    """,
)
def s1_string_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    customer = load_table(spark, sf_dir, "customer")
    return customer.filter(F.col("c_custkey") <= 600).select(
        "c_custkey",
        F.upper("c_name").alias("name_upper"),
        F.lower("c_mktsegment").alias("seg_lower"),
        F.substring("c_name", 1, 8).alias("name_prefix"),
        F.length("c_name").alias("name_len"),
        F.trim(F.concat(F.lit("  "), F.col("c_name"), F.lit("  "))).alias("name_trim"),
        F.concat_ws("|", "c_mktsegment", "c_name").alias("seg_name"),
        F.lpad(F.col("c_custkey").cast("string"), 10, "0").alias("key_padded"),
        F.replace(F.col("c_name"), F.lit("#"), F.lit("-")).alias("name_dashed"),
        F.contains(F.col("c_name"), F.lit("1")).alias("has_one"),
        F.startswith(F.col("c_name"), F.lit("Customer")).alias("is_customer"),
    )


@register(
    "s2_regex_levenshtein",
    oracle="""
    SELECT p_partkey, p_type,
           REGEXP_EXTRACT(p_type, '([A-Z]+)', 1)        AS first_word,
           REGEXP_MATCHES(p_type, 'BRUSHED|POLISHED')   AS is_finished,
           REGEXP_REPLACE(p_type, '[AEIOU]', '_', 'g')  AS devoweled,
           LEVENSHTEIN(p_brand, 'Brand#1')              AS brand_dist
    FROM part
    WHERE p_partkey <= 500
    """,
)
def s2_regex_levenshtein(spark: SparkSession, sf_dir: str) -> DataFrame:
    # DuckDB regexp_replace is single-replacement unless the 'g' flag is
    # passed; Spark's is global always — keep the 'g' on the oracle side.
    part = load_table(spark, sf_dir, "part")
    return part.filter(F.col("p_partkey") <= 500).select(
        "p_partkey",
        "p_type",
        F.regexp_extract("p_type", r"([A-Z]+)", 1).alias("first_word"),
        F.col("p_type").rlike("BRUSHED|POLISHED").alias("is_finished"),
        F.regexp_replace("p_type", "[AEIOU]", "_").alias("devoweled"),
        F.levenshtein("p_brand", F.lit("Brand#1")).alias("brand_dist"),
    )


@register(
    "s3_date_functions",
    oracle="""
    SELECT o_orderkey,
           YEAR(o_orderdate)                       AS order_year,
           MONTH(o_orderdate)                      AS order_month,
           DAYOFMONTH(o_orderdate)                 AS order_day,
           CAST(DATE_TRUNC('month', o_orderdate) AS TIMESTAMP) AS month_start,
           DATE_DIFF('day', o_orderdate, TIMESTAMP '1998-12-31 00:00:00') AS days_to_eoy,
           CAST(o_orderdate + INTERVAL 30 DAY AS TIMESTAMP) AS due_date,
           CAST(o_orderdate AS DATE)               AS order_date_only,
           CAST(EPOCH(o_orderdate) AS BIGINT)      AS epoch_sec
    FROM orders
    WHERE o_orderkey <= 3000
    """,
)
def s3_date_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    # datediff arg order differs across engines: Spark (end, start),
    # DuckDB date_diff(part, start, end) — the oracle is written to match.
    orders = load_table(spark, sf_dir, "orders")
    return orders.filter(F.col("o_orderkey") <= 3000).select(
        "o_orderkey",
        F.year("o_orderdate").alias("order_year"),
        F.month("o_orderdate").alias("order_month"),
        F.dayofmonth("o_orderdate").alias("order_day"),
        F.date_trunc("month", F.col("o_orderdate")).alias("month_start"),
        F.datediff(
            F.lit("1998-12-31 00:00:00").cast("timestamp"), F.col("o_orderdate")
        ).alias("days_to_eoy"),
        (F.col("o_orderdate") + F.expr("INTERVAL 30 DAYS")).alias("due_date"),
        F.col("o_orderdate").cast("date").alias("order_date_only"),
        F.unix_timestamp("o_orderdate").alias("epoch_sec"),
    )


@register(
    "s4_math_functions",
    oracle=f"""
    SELECT l_orderkey, l_linenumber,
           CAST(FLOOR(l_extendedprice) AS BIGINT) AS price_floor,
           CAST(CEIL(l_extendedprice) AS BIGINT)  AS price_ceil,
           ABS(l_discount - 0.05)            AS disc_dev,
           {sql_dround("SQRT(l_quantity)", 6)}      AS qty_sqrt,
           {sql_dround(
               "CASE WHEN l_extendedprice > 0"
               " THEN LN(l_extendedprice) END", 6)} AS price_ln,
           {sql_dround("POW(l_quantity, 2)", 4)}    AS qty_sq,
           CAST(SIGN(l_discount - 0.05) AS DOUBLE) AS disc_sign,
           MOD(l_orderkey, 7)                AS key_mod
    FROM lineitem
    WHERE l_orderkey <= 1000
    """,
)
def s4_math_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    return li.filter(F.col("l_orderkey") <= 1000).select(
        "l_orderkey",
        "l_linenumber",
        F.floor("l_extendedprice").alias("price_floor"),
        F.ceil("l_extendedprice").alias("price_ceil"),
        F.abs(F.col("l_discount") - 0.05).alias("disc_dev"),
        dround(F.sqrt("l_quantity"), 6).alias("qty_sqrt"),
        # explicit > 0 guard, not bare log: Spark happens to return
        # NULL on non-positives where DuckDB's LN raises — the guard
        # makes the shared semantics explicit on both engines
        dround(
            F.when(F.col("l_extendedprice") > 0,
                   F.log("l_extendedprice")),
            6,
        ).alias("price_ln"),
        dround(F.pow("l_quantity", 2), 4).alias("qty_sq"),
        F.signum(F.col("l_discount") - 0.05).alias("disc_sign"),
        (F.col("l_orderkey") % 7).alias("key_mod"),
    )


@register(
    "s5_array_functions",
    oracle="""
    SELECT doc_id,
           len(string_split(text, ' '))                       AS n_tokens,
           len(list_distinct(string_split(text, ' ')))        AS n_distinct,
           array_to_string(list_sort(list_distinct(string_split(text, ' ')))[1:5], ',') AS first_tokens,
           list_contains(string_split(text, ' '), 'scan')     AS has_scan,
           array_to_string(list_sort(list_distinct(string_split(text, ' ')))[1:3], ',') AS top3_csv
    FROM documents
    WHERE doc_id <= 100
    """,
)
def s5_array_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    toks = F.split(F.col("text"), " ")
    dtoks = F.array_sort(F.array_distinct(toks))
    return docs.filter(F.col("doc_id") <= 100).select(
        "doc_id",
        F.size(toks).alias("n_tokens"),
        F.size(F.array_distinct(toks)).alias("n_distinct"),
        # CSV-serialized (not array-typed): the driver's canonicalizer
        # sorts result cells with pandas and crashes on ndarray cells.
        F.concat_ws(",", F.slice(dtoks, 1, 5)).alias("first_tokens"),
        F.array_contains(toks, "scan").alias("has_scan"),
        F.concat_ws(",", F.slice(dtoks, 1, 3)).alias("top3_csv"),
    )


@register(
    "s6_higher_order_functions",
    oracle=f"""
    SELECT vec_id,
           {sql_dround("list_aggregate(list_transform(embedding::DOUBLE[], x -> x * x), 'sum')", 6)} AS sum_squares,
           len(list_filter(embedding::DOUBLE[], x -> x > 0)) AS n_positive,
           {sql_dround("list_aggregate(embedding::DOUBLE[], 'max')", 6)} AS max_component,
           {sql_dround("list_aggregate(embedding::DOUBLE[], 'min')", 6)} AS min_component
    FROM embeddings
    WHERE vec_id <= 200
    """,
)
def s6_higher_order_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    vec = F.transform(F.col("embedding"), lambda x: x.cast("double"))
    return emb.filter(F.col("vec_id") <= 200).select(
        "vec_id",
        dround(
            F.aggregate(
                F.transform(vec, lambda x: x * x),
                F.lit(0.0),
                lambda acc, x: acc + x,
            ),
            6,
        ).alias("sum_squares"),
        F.size(F.filter(vec, lambda x: x > 0)).alias("n_positive"),
        dround(F.array_max(vec), 6).alias("max_component"),
        dround(F.array_min(vec), 6).alias("min_component"),
    )


@register(
    "s7_json_functions",
    oracle="""
    SELECT event_id, event_type,
           CAST(props->>'$.k' AS INT) AS k_value,
           CASE WHEN CAST(props->>'$.k' AS INT) >= 50 THEN 'high' ELSE 'low' END AS k_bucket
    FROM events
    WHERE event_id <= 2000
    """,
)
def s7_json_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events")
    k = F.get_json_object("props", "$.k").cast("int")
    return events.filter(F.col("event_id") <= 2000).select(
        "event_id",
        "event_type",
        k.alias("k_value"),
        F.when(k >= 50, "high").otherwise("low").alias("k_bucket"),
    )


@register(
    "s8_json_aggregate",
    oracle="""
    SELECT event_type,
           CAST(SUM(CAST(props->>'$.k' AS INT)) AS BIGINT) AS k_total,
           MAX(CAST(props->>'$.k' AS INT)) AS k_max,
           COUNT(*) AS n
    FROM events
    GROUP BY event_type
    """,
)
def s8_json_aggregate(spark: SparkSession, sf_dir: str) -> DataFrame:
    # from_json with an explicit schema (vs get_json_object) — one parse,
    # typed access; the idiomatic form when extracting multiple fields.
    events = load_table(spark, sf_dir, "events")
    parsed = events.withColumn("p", F.from_json("props", "k INT"))
    return parsed.groupBy("event_type").agg(
        F.sum("p.k").alias("k_total"),
        F.max("p.k").alias("k_max"),
        F.count("*").alias("n"),
    )


@register(
    "s9_hash_functions",
    oracle="""
    SELECT doc_id,
           MD5(text)                 AS text_md5,
           SHA256(text)              AS text_sha256,
           MD5(CONCAT(lang, ':', source)) AS meta_md5
    FROM documents
    WHERE doc_id <= 100
    """,
)
def s9_hash_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    # md5/sha256 are bit-exact across engines; xxhash64/murmur are
    # seed/implementation-specific and stay out of oracle queries.
    docs = load_table(spark, sf_dir, "documents")
    return docs.filter(F.col("doc_id") <= 100).select(
        "doc_id",
        F.md5("text").alias("text_md5"),
        F.sha2("text", 256).alias("text_sha256"),
        F.md5(F.concat(F.col("lang"), F.lit(":"), F.col("source"))).alias("meta_md5"),
    )


@register(
    "s10_explode_unnest",
    oracle="""
    SELECT doc_id, t.token AS token
    FROM documents, UNNEST(string_split(text, ' ')) AS t(token)
    WHERE doc_id <= 20
    """,
)
def s10_explode_unnest(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return (
        docs.filter(F.col("doc_id") <= 20)
        .select("doc_id", F.explode(F.split("text", " ")).alias("token"))
    )


@register(
    "s11_sequence_generate",
    oracle="""
    SELECT r_regionkey, g.n AS n, r_regionkey * 10 + g.n AS derived
    FROM region, (SELECT unnest(generate_series(1, 5)) AS n) AS g
    """,
)
def s11_sequence_generate(spark: SparkSession, sf_dir: str) -> DataFrame:
    region = load_table(spark, sf_dir, "region")
    return (
        region.select(
            "r_regionkey", F.explode(F.sequence(F.lit(1), F.lit(5))).alias("n")
        )
        .withColumn("derived", F.col("r_regionkey") * 10 + F.col("n"))
    )


@register(
    "s12_conditional_null",
    oracle="""
    SELECT s_suppkey,
           COALESCE(NULLIF(s_name, 'Supplier#1'), 'PRIMARY')  AS display_name,
           CASE WHEN s_acctbal < 0 THEN 'debt'
                WHEN s_acctbal < 5000 THEN 'normal'
                ELSE 'premium' END                            AS balance_class,
           IFNULL(NULLIF(s_nationkey, 0), -1)                 AS nation_or_default,
           GREATEST(s_acctbal, 0.0)                           AS bal_floor0,
           LEAST(s_acctbal, 9999.0)                           AS bal_cap
    FROM supplier
    """,
)
def s12_conditional_null(spark: SparkSession, sf_dir: str) -> DataFrame:
    supplier = load_table(spark, sf_dir, "supplier")
    return supplier.select(
        "s_suppkey",
        F.coalesce(
            F.nullif(F.col("s_name"), F.lit("Supplier#1")), F.lit("PRIMARY")
        ).alias("display_name"),
        F.when(F.col("s_acctbal") < 0, "debt")
        .when(F.col("s_acctbal") < 5000, "normal")
        .otherwise("premium")
        .alias("balance_class"),
        F.coalesce(F.nullif(F.col("s_nationkey"), F.lit(0)), F.lit(-1)).alias(
            "nation_or_default"
        ),
        F.greatest(F.col("s_acctbal"), F.lit(0.0)).alias("bal_floor0"),
        F.least(F.col("s_acctbal"), F.lit(9999.0)).alias("bal_cap"),
    )


@register(
    "s13_map_functions",
    oracle="""
    SELECT c_custkey,
           c_acctbal AS bal_value,
           c_mktsegment AS seg_value,
           2 AS n_keys,
           'bal' AS first_key
    FROM customer
    WHERE c_custkey <= 300
    """,
)
def s13_map_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MapType surface: build a map, then read it back via element_at /
    map_keys — the oracle supplies the ground-truth values the map
    round-trip must reproduce."""
    customer = load_table(spark, sf_dir, "customer")
    m = F.create_map(
        F.lit("bal"), F.col("c_acctbal").cast("string"),
        F.lit("seg"), F.col("c_mktsegment"),
    )
    return customer.filter(F.col("c_custkey") <= 300).select(
        "c_custkey",
        F.element_at(m, "bal").cast("double").alias("bal_value"),
        F.element_at(m, "seg").alias("seg_value"),
        F.size(F.map_keys(m)).alias("n_keys"),
        F.array_min(F.map_keys(m)).alias("first_key"),
    )


@register(
    "s14_date_formatting",
    oracle="""
    SELECT o_orderkey,
           STRFTIME(o_orderdate, '%Y-%m-%d')           AS iso_day,
           STRFTIME(o_orderdate, '%Y/%m')              AS ym,
           CAST(LAST_DAY(o_orderdate) AS DATE)         AS month_end,
           QUARTER(o_orderdate)                        AS qtr,
           WEEKOFYEAR(o_orderdate)                     AS iso_week,
           CAST(EPOCH(o_orderdate) AS BIGINT)          AS epoch_sec,
           MAKE_DATE(1995, 6, 15)                      AS fixed_date
    FROM orders
    WHERE o_orderkey <= 3000
    """,
)
def s14_date_formatting(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Datetime formatting/derivation battery — Spark's SimpleDateFormat
    patterns vs DuckDB strftime produce the same strings for the shared
    subset used here (zero-padded numeric fields)."""
    orders = load_table(spark, sf_dir, "orders")
    return orders.filter(F.col("o_orderkey") <= 3000).select(
        "o_orderkey",
        F.date_format("o_orderdate", "yyyy-MM-dd").alias("iso_day"),
        F.date_format("o_orderdate", "yyyy/MM").alias("ym"),
        F.last_day("o_orderdate").alias("month_end"),
        F.quarter("o_orderdate").alias("qtr"),
        F.weekofyear("o_orderdate").alias("iso_week"),
        F.unix_timestamp("o_orderdate").alias("epoch_sec"),
        F.make_date(F.lit(1995), F.lit(6), F.lit(15)).alias("fixed_date"),
    )


@register(
    "s15_array_functions_2",
    oracle="""
    WITH t AS (
        SELECT doc_id, string_split(text, ' ') AS toks FROM documents
        WHERE doc_id <= 100
    )
    SELECT doc_id,
           LIST_POSITION(toks, 'the')                   AS pos_the,
           LIST_CONTAINS(toks, 'data')                  AS has_data,
           LIST_HAS_ANY(toks, ['data', 'scan', 'the'])  AS overlaps_lex,
           array_to_string(FLATTEN([toks[1:2], toks[3:4]]), ',') AS first_four,
           LIST_REVERSE(toks)[1]                        AS last_tok
    FROM t
    """,
)
def s15_array_functions_2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Second array battery: position (1-based; 0 = absent in both
    engines), membership, overlap, flatten, reverse."""
    docs = load_table(spark, sf_dir, "documents")
    toks = F.split(F.col("text"), " ", -1)
    return docs.filter(F.col("doc_id") <= 100).select(
        "doc_id",
        F.array_position(toks, "the").alias("pos_the"),
        F.array_contains(toks, "data").alias("has_data"),
        F.arrays_overlap(toks, F.array(F.lit("data"), F.lit("scan"), F.lit("the"))).alias(
            "overlaps_lex"
        ),
        # CSV-serialized: array cells crash the driver's pandas canonicalizer.
        F.concat_ws(",", F.flatten(F.array(F.slice(toks, 1, 2), F.slice(toks, 3, 2)))).alias(
            "first_four"
        ),
        F.element_at(F.reverse(toks), 1).alias("last_tok"),
    )


@register(
    "s16_bitwise",
    oracle="""
    SELECT event_type,
           BIT_AND(user_id)                  AS band,
           BIT_OR(user_id)                   AS bor,
           BIT_XOR(user_id)                  AS bxor,
           MAX(user_id << 2)                 AS shifted,
           MAX(user_id & 255)                AS masked
    FROM events
    GROUP BY event_type
    """,
)
def s16_bitwise(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bitwise aggregates + scalar shifts/masks on int64 keys."""
    events = load_table(spark, sf_dir, "events")
    return events.groupBy("event_type").agg(
        F.bit_and("user_id").alias("band"),
        F.bit_or("user_id").alias("bor"),
        F.bit_xor("user_id").alias("bxor"),
        F.max(F.shiftleft(F.col("user_id"), 2)).alias("shifted"),
        F.max(F.col("user_id").bitwiseAND(F.lit(255))).alias("masked"),
    )


@register(
    "s17_null_handling",
    oracle="""
    WITH flagged AS (
        SELECT c_custkey,
               CASE WHEN c_custkey % 7 = 0 THEN NULL ELSE c_acctbal END AS bal,
               CASE WHEN c_custkey % 5 = 0 THEN NULL ELSE c_mktsegment END AS seg
        FROM customer
    )
    SELECT c_custkey,
           COALESCE(bal, -1.0)                       AS bal_filled,
           COALESCE(seg, 'UNKNOWN')                  AS seg_filled,
           bal IS NULL                               AS bal_was_null,
           NULLIF(seg, 'BUILDING')                   AS seg_nullif,
           TRY_CAST(seg AS DOUBLE)                   AS seg_as_num,
           IFNULL(bal, 0.0) + COALESCE(bal, 0.0)     AS bal_doubled
    FROM flagged
    WHERE bal IS NOT NULL OR seg IS NOT NULL
    """,
)
def s17_null_handling(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Null-handling battery: synthesized nulls → na.fill (the
    DataFrame API form of COALESCE), IS NULL flags, NULLIF, try_cast
    (NULL on failure, never an exception), IFNULL."""
    customer = load_table(spark, sf_dir, "customer")
    flagged = customer.select(
        "c_custkey",
        F.when(F.col("c_custkey") % 7 == 0, None)
        .otherwise(F.col("c_acctbal"))
        .alias("bal"),
        F.when(F.col("c_custkey") % 5 == 0, None)
        .otherwise(F.col("c_mktsegment"))
        .alias("seg"),
    )
    filled = flagged.na.fill({"bal": -1.0, "seg": "UNKNOWN"})
    return (
        flagged.filter(F.col("bal").isNotNull() | F.col("seg").isNotNull())
        .join(filled.select(
            "c_custkey",
            F.col("bal").alias("bal_filled"),
            F.col("seg").alias("seg_filled"),
        ), "c_custkey")
        .select(
            "c_custkey",
            "bal_filled",
            "seg_filled",
            F.col("bal").isNull().alias("bal_was_null"),
            F.nullif(F.col("seg"), F.lit("BUILDING")).alias("seg_nullif"),
            F.col("seg").try_cast("double").alias("seg_as_num"),
            (F.ifnull(F.col("bal"), F.lit(0.0)) + F.coalesce(F.col("bal"), F.lit(0.0))).alias("bal_doubled"),
        )
    )

"""Scalar-function query surface — the mapping DSL's cast kernel (SURVEY
§2.4 F1-F9) exercised as standalone relational queries: string functions,
date functions, JSON extraction (F8/decode_json), conditional expressions,
and the explode/tokenize path (the UDTF-shaped surface).

Everything is built-in ``pyspark.sql.functions`` — JVM-side, inside
whole-stage codegen; no Python UDFs anywhere on these paths.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources.tables import load_table
from .registry import query


@query(
    "q_json_extract_props",
    oracle="""
    SELECT event_type,
           CAST(SUM(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS sum_k,
           COUNT(*) AS n
    FROM events GROUP BY event_type
    """,
    tags=("scalar", "json"),
    doc="JSON field extraction (decode_json/F8 analog) + aggregate: "
        "get_json_object stays in codegen, no Python json.loads.",
)
def q_json_extract_props(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, "events", sf_dir)
    return ev.groupBy("event_type").agg(
        F.sum(F.get_json_object("props", "$.k").cast("long")).cast("long").alias("sum_k"),
        F.count("*").alias("n"),
    )


@query(
    "q_string_functions",
    oracle="""
    SELECT doc_id,
           upper(lang) AS lang_u,
           CAST(length(text) AS INTEGER) AS n_chars,
           substr(text, 1, 12) AS prefix,
           concat(lang, '-', source) AS tag,
           CAST(strpos(text, 'data') AS INTEGER) AS pos_data,
           regexp_replace(text, 'data', 'DATA', 'g') AS replaced,
           md5(text) AS text_md5
    FROM documents
    """,
    tags=("scalar", "string"),
    doc="String kernel (str cast F1 + text ops): case, length, substring, "
        "concat, find, global regexp replace, md5 fingerprint.",
)
def q_string_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, "documents", sf_dir)
    return docs.select(
        "doc_id",
        F.upper("lang").alias("lang_u"),
        F.length("text").alias("n_chars"),
        F.substring("text", 1, 12).alias("prefix"),
        F.concat_ws("-", "lang", "source").alias("tag"),
        F.instr("text", "data").alias("pos_data"),
        F.regexp_replace("text", "data", "DATA").alias("replaced"),
        F.md5("text").alias("text_md5"),
    )


@query(
    "q_date_functions",
    oracle="""
    SELECT o_orderkey,
           CAST(year(o_orderdate) AS INTEGER) AS order_year,
           CAST(month(o_orderdate) AS INTEGER) AS order_month,
           CAST(quarter(o_orderdate) AS INTEGER) AS order_quarter,
           CAST(date_trunc('month', o_orderdate) AS TIMESTAMP) AS month_start,
           o_orderdate + INTERVAL 30 DAY AS due_date
    FROM orders
    """,
    tags=("scalar", "date"),
    doc="Date/time kernel (from_datetime F5 analog): extract parts, "
        "truncate, interval arithmetic.",
)
def q_date_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, "orders", sf_dir)
    return orders.select(
        "o_orderkey",
        F.year("o_orderdate").alias("order_year"),
        F.month("o_orderdate").alias("order_month"),
        F.quarter("o_orderdate").alias("order_quarter"),
        F.date_trunc("month", "o_orderdate").alias("month_start"),
        (F.col("o_orderdate") + F.expr("INTERVAL 30 DAYS")).alias("due_date"),
    )


@query(
    "q_conditional_buckets",
    oracle="""
    SELECT CASE WHEN o_totalprice < 1000 THEN 'small'
                WHEN o_totalprice < 10000 THEN 'medium'
                ELSE 'large' END AS price_band,
           COALESCE(NULLIF(o_orderstatus, 'O'), 'OPEN') AS status_label,
           COUNT(*) AS n
    FROM orders GROUP BY 1, 2
    """,
    tags=("scalar", "conditional"),
    doc="CASE/NULLIF/COALESCE conditional kernel (default-substitution F12 "
        "analog) with grouping on derived columns.",
)
def q_conditional_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, "orders", sf_dir)
    band = (
        F.when(F.col("o_totalprice") < 1000, "small")
        .when(F.col("o_totalprice") < 10000, "medium")
        .otherwise("large")
    )
    status = F.coalesce(F.nullif(F.col("o_orderstatus"), F.lit("O")), F.lit("OPEN"))
    return orders.groupBy(
        band.alias("price_band"), status.alias("status_label")
    ).agg(F.count("*").alias("n"))


@query(
    "q_explode_token_counts",
    oracle="""
    SELECT token, CAST(COUNT(*) AS BIGINT) AS cnt
    FROM (SELECT unnest(string_split(text, ' ')) AS token FROM documents)
    GROUP BY token
    ORDER BY cnt DESC, token
    LIMIT 30
    """,
    tags=("explode", "udtf"),
    doc="Lateral explode (the UDTF-shaped surface): tokenize every "
        "document, global token frequencies, deterministic top-30.",
)
def q_explode_token_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, "documents", sf_dir)
    return (
        docs.select(F.explode(F.split("text", " ")).alias("token"))
        .groupBy("token")
        .agg(F.count("*").alias("cnt"))
        .orderBy(F.desc("cnt"), F.asc("token"))
        .limit(30)
    )


@query(
    "q_array_functions",
    oracle="""
    SELECT doc_id,
           CAST(len(string_split(text, ' ')) AS INTEGER) AS n_tokens,
           CAST(len(list_distinct(string_split(text, ' '))) AS INTEGER) AS n_distinct,
           list_contains(string_split(text, ' '), 'data') AS has_data,
           array_to_string(list_sort(list_distinct(string_split(substr(text, 1, 40), ' '))), ',')
               AS head_vocab
    FROM documents
    """,
    tags=("scalar", "array"),
    doc="Array kernel ([List,*] casts F6/F7 analog): size, distinct, "
        "contains, sort, join — all on JVM array expressions.",
)
def q_array_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, "documents", sf_dir)
    toks = F.split("text", " ")
    return docs.select(
        "doc_id",
        F.size(toks).alias("n_tokens"),
        F.size(F.array_distinct(toks)).alias("n_distinct"),
        F.array_contains(toks, "data").alias("has_data"),
        F.array_join(
            F.array_sort(F.array_distinct(F.split(F.substring("text", 1, 40), " "))), ","
        ).alias("head_vocab"),
    )


@query(
    "q_variant_schemaless",
    oracle="""
    SELECT event_type,
           CAST(SUM(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT)
               AS sum_k,
           CAST(MAX(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT)
               AS max_k,
           COUNT(*) AS n
    FROM events
    WHERE CAST(json_extract_string(props, '$.k') AS BIGINT) >= 10
    GROUP BY event_type
    """,
    tags=("scalar", "variant", "schemaless"),
    doc="Schemaless documents as Spark 4 VARIANT (SURVEY §1.5's mapping "
        "for Arango's schema-free rows): parse_json once into a variant "
        "column, typed path access via try_variant_get (shredded access, "
        "no full re-parse per field), predicate + aggregate on the "
        "extracted value.",
)
def q_variant_schemaless(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, "events", sf_dir)
    k = F.try_variant_get(F.parse_json("props"), "$.k", "long")
    return (
        ev.select("event_type", k.alias("k"))
        .filter(F.col("k") >= 10)
        .groupBy("event_type")
        .agg(
            F.sum("k").cast("long").alias("sum_k"),
            F.max("k").cast("long").alias("max_k"),
            F.count("*").alias("n"),
        )
    )

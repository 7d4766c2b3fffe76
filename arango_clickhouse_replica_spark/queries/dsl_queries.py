"""Schema-mapping DSL exercised through the driver gate.

The mapping DSL compiler (``schema/dsl.py``) is the Spark-native
re-expression of the reference's transform kernel
(``replication/consumer/transformer.py:63-108``): rename / cast /
default / union-type / required-validation, compiled once into Column
expressions. The unit suite (tests/test_dsl.py) covers the rejection
semantics; these queries prove the VALID path end-to-end against a SQL
oracle — each DSL feature has a direct ANSI-SQL equivalent the oracle
spells out (try_cast chains, coalesce defaults, renames).

Scale notes: a compiled mapping is one narrow ``select`` — fully
pipelined with the scan, no shuffle, no Python in the row path.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..schema.dsl import TableMapping, apply_mapping
from ..sources.tables import load_table
from .registry import query

# Mapping over `documents`: rename (ref), int/str casts, default for a
# statically-absent field, a union-type chain, and required/PK checks.
_DOCS_MAPPING = TableMapping.from_dict(
    {
        "table_name": "docs_mapped",
        "schema": {
            "primary_key": ["id"],
            "properties": {
                "id": {"type": "int", "ref": "doc_id"},
                "body": {"type": "str", "ref": "text", "required": True},
                "lang": {"type": "str", "default": "und"},
                # union chain: int first (fails for 'web'/'wiki'...), then str
                "origin": {"type": ["int", "str"], "ref": "source"},
                "size_chars": {"type": "int", "ref": "n_chars", "required": True},
                # statically absent in the source -> default for every row
                "quality": {"type": "float", "ref": "quality_score", "default": 0.5},
            },
        },
    }
)


@query(
    "dsl_mapping_documents",
    oracle="""
    SELECT CAST(doc_id AS BIGINT) AS id,
           text AS body,
           COALESCE(lang, 'und') AS lang,
           CASE WHEN TRY_CAST(source AS BIGINT) IS NOT NULL
                THEN CAST(TRY_CAST(source AS BIGINT) AS VARCHAR)
                ELSE CAST(source AS VARCHAR) END AS origin,
           CAST(n_chars AS BIGINT) AS size_chars,
           CAST(0.5 AS DOUBLE) AS quality
    FROM documents
    WHERE doc_id IS NOT NULL AND text IS NOT NULL AND n_chars IS NOT NULL
    """,
    tags=("dsl", "mapping", "cast"),
    doc="Mapping DSL end-to-end (transformer.py:63-108 semantics): rename, "
        "casts, default substitution, union-type chain, required/PK "
        "validation; oracle spells out the equivalent "
        "try_cast/coalesce/case SQL. Valid rows only (rejections are "
        "dead-lettered; unit-tested in tests/test_dsl.py).",
)
def dsl_mapping_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, "documents", sf_dir)
    return apply_mapping(docs, _DOCS_MAPPING).valid


_EVENTS_MAPPING = TableMapping.from_dict(
    {
        "table_name": "events_mapped",
        "schema": {
            "primary_key": ["eid"],
            "properties": {
                "eid": {"type": "int", "ref": "event_id"},
                "occurred": {"type": "from_datetime", "ref": "ts", "required": True},
                "kind": {"type": "str", "ref": "event_type", "required": True},
                "amount": {"type": "float", "ref": "value", "default": 0.0},
                "props_map": {"type": "decode_json", "ref": "props"},
                "tags": {"type": "to_array", "ref": "event_type"},
            },
        },
    }
)


@query(
    "dsl_mapping_events",
    oracle="""
    SELECT CAST(event_id AS BIGINT) AS eid,
           ts AS occurred,
           event_type AS kind,
           COALESCE(CAST(value AS DOUBLE), 0.0) AS amount,
           'k=' || json_extract_string(props, '$.k') AS props_kv,
           array_to_string([event_type], ',') AS tags
    FROM events
    WHERE event_id IS NOT NULL AND ts IS NOT NULL AND event_type IS NOT NULL
    """,
    tags=("dsl", "mapping", "json", "datetime"),
    doc="Mapping DSL over the event stream shape: timestamp cast "
        "(from_datetime/F5), JSON decode to map (decode_json/F8), CSV "
        "split custom transform (to_array/F9, tables/transform.py:1-3), "
        "float cast with default. The decoded map is serialized to sorted "
        "'k=v' entries for an engine-portable comparison (DuckDB's MAP "
        "pandas shape differs from Spark's dict).",
)
def dsl_mapping_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, "events", sf_dir)
    valid = apply_mapping(ev, _EVENTS_MAPPING).valid
    entries = F.transform(
        F.map_entries("props_map"),
        lambda e: F.concat(e["key"], F.lit("="), e["value"]),
    )
    return valid.select(
        "eid", "occurred", "kind", "amount",
        F.array_join(F.array_sort(entries), ",").alias("props_kv"),
        F.array_join("tags", ",").alias("tags"),
    )


# Dead-letter channel (A1/A4): rows that fail validation are split off
# with their error messages, never dropped silently (loader.py:40-49,
# 82-86 semantics). Corruption is injected deterministically so the
# rejected set is SQL-expressible.
_DEADLETTER_MAPPING = TableMapping.from_dict(
    {
        "table_name": "docs_strict",
        "schema": {
            "primary_key": ["id"],
            "properties": {
                "id": {"type": "int", "ref": "doc_id"},
                "body": {"type": "str", "ref": "text", "required": True},
                "size": {"type": "int", "ref": "n_chars_s"},
            },
        },
    }
)


@query(
    "dsl_deadletter_split",
    oracle="""
    SELECT doc_id AS id,
           concat_ws(';',
             CASE WHEN doc_id % 7 = 0 THEN 'body value is not present' END,
             CASE WHEN doc_id % 11 = 0 THEN 'size: cast to [''int''] failed' END
           ) AS errors
    FROM documents
    WHERE doc_id % 7 = 0 OR doc_id % 11 = 0
    """,
    tags=("dsl", "dead-letter", "error-handling"),
    doc="Dead-letter split (A1/A4, loader.py:40-49): deterministically "
        "corrupted rows (missing required field every 7th, uncastable int "
        "every 11th) are rejected with their exact error messages; the "
        "oracle reproduces the rejected set and messages. Valid rows "
        "continue unaffected (asserted in tests/test_dsl.py).",
)
def dsl_deadletter_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, "documents", sf_dir)
    corrupted = docs.select(
        "doc_id",
        F.when(F.col("doc_id") % 7 == 0, F.lit(None)).otherwise(F.col("text")).alias("text"),
        F.when(F.col("doc_id") % 11 == 0, F.concat(F.col("n_chars").cast("string"), F.lit("x")))
        .otherwise(F.col("n_chars").cast("string"))
        .alias("n_chars_s"),
    )
    rejected = apply_mapping(corrupted, _DEADLETTER_MAPPING).rejected
    return rejected.select(
        F.col("doc_id").cast("long").alias("id"),
        F.array_join("_errors", ";").alias("errors"),
    )

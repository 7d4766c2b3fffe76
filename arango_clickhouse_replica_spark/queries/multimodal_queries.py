"""Multimodal-column queries (SURVEY §2.12): binary payloads + metadata
structs + Pandas-UDF feature extraction over ``mapInPandas``."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.multimodal import documents_as_media, extract_features
from ..sources.tables import load_table
from .registry import query


@query(
    "mm_payload_stats",
    oracle="""
    SELECT doc_id AS media_id,
           CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
           md5(text) AS digest,
           source
    FROM documents
    """,
    tags=("multimodal", "binary"),
    doc="Opaque binary payload handling JVM-side: byte length and digest "
        "of a BinaryType column (md5 over the utf-8 payload bytes matches "
        "DuckDB's md5 over the varchar's utf-8 encoding).",
)
def mm_payload_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    media = documents_as_media(load_table(spark, "documents", sf_dir))
    return media.select(
        "media_id",
        F.length("payload").cast("long").alias("n_bytes"),
        F.md5("payload").alias("digest"),
        F.col("meta.source").alias("source"),
    )


@query(
    "mm_feature_extract",
    oracle=None,  # Pandas-UDF decode path; deterministic but not SQL —
    # cross-validated against a JVM-native computation in tests/test_multimodal.py
    tags=("multimodal", "pandas-udf"),
    doc="Arrow-batched decode/feature-extract over mapInPandas: byte "
        "histogram + checksum per payload (deterministic fake decode; the "
        "real codec raises NotImplementedError where it would plug in). "
        "Narrow stage — no shuffle; parallelism = input file splits.",
)
def mm_feature_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    media = documents_as_media(load_table(spark, "documents", sf_dir))
    return extract_features(media, decode="fake")

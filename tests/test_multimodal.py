"""Multimodal plumbing tests: the Pandas-UDF feature path must agree with
an independent JVM-native computation of the same features."""

import pytest
from pyspark.sql import functions as F

from arango_clickhouse_replica_spark.operators.multimodal import (
    documents_as_media,
    extract_features,
)
from arango_clickhouse_replica_spark.sources.tables import load_table


def test_fake_decode_matches_native_computation(spark, sf_dir):
    docs = load_table(spark, "documents", sf_dir).limit(50)
    media = documents_as_media(docs)
    via_udf = {r.media_id: (list(r.byte_histogram), r.checksum, r.n_bytes)
               for r in extract_features(media, decode="fake").collect()}

    # independent JVM-side computation of the same features
    chars = F.split(F.col("text"), "")
    bucket = lambda lo, hi: F.size(  # noqa: E731
        F.filter(chars, lambda c: (F.ascii(c) >= lo) & (F.ascii(c) < hi))
    ).cast("long")
    native = docs.select(
        F.col("doc_id").alias("media_id"),
        F.array(bucket(0, 64), bucket(64, 128), bucket(128, 192), bucket(192, 256)).alias("hist"),
        F.aggregate(chars, F.lit(0).cast("long"), lambda a, c: a + F.ascii(c)).alias("bytesum"),
        F.length(F.encode("text", "utf-8")).cast("long").alias("n_bytes"),
    )
    for r in native.collect():
        hist, checksum, n_bytes = via_udf[r.media_id]
        assert hist == list(r.hist), f"histogram mismatch for {r.media_id}"
        assert checksum == format(r.bytesum % (1 << 32), "08x")
        assert n_bytes == r.n_bytes


def test_image_decode_is_explicitly_stubbed(spark, sf_dir):
    media = documents_as_media(load_table(spark, "documents", sf_dir))
    with pytest.raises(NotImplementedError):
        extract_features(media, decode="image")
    with pytest.raises(ValueError):
        extract_features(media, decode="bogus")

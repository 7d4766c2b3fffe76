"""Multimodal column operators: image/audio/video as opaque binary columns
with typed metadata, processed via Arrow-batched Pandas UDFs.

The container has no image/audio codecs, so the DECODE step is stubbed
(deterministic fake features, or ``NotImplementedError`` when a real codec
is requested) — but the Spark-side plumbing is real and tested: binary
column schema, metadata struct, ``mapInPandas`` batch shape, and the
partitioning contract.

Scale notes (100 TB of media): binary payloads ride in parquet as
BinaryType column chunks; decode/feature-extract is a NARROW mapInPandas
stage (no shuffle) whose parallelism is the file-split count — size
``spark.sql.files.maxPartitionBytes`` so one batch of payloads fits
executor memory. Feature vectors come back as array<float> columns that
flow into the ANN/dedup operators above.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

# Schema of the multimodal record: opaque payload + typed metadata.
MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("payload", T.BinaryType(), True),
        T.StructField(
            "meta",
            T.StructType(
                [
                    T.StructField("mime", T.StringType(), True),
                    T.StructField("n_bytes", T.LongType(), True),
                    T.StructField("source", T.StringType(), True),
                ]
            ),
            True,
        ),
    ]
)

FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("mime", T.StringType(), True),
        T.StructField("n_bytes", T.LongType(), True),
        T.StructField("byte_histogram", T.ArrayType(T.LongType()), True),
        T.StructField("checksum", T.StringType(), True),
    ]
)

_HAVE_PIL = False
try:  # real codec path, absent in this container
    import PIL.Image  # noqa: F401

    _HAVE_PIL = True
except ImportError:
    pass


def documents_as_media(docs: DataFrame) -> DataFrame:
    """Adapt the documents fixture into multimodal records: the text bytes
    become the opaque payload (a deterministic stand-in for image bytes)."""
    return docs.select(
        F.col("doc_id").alias("media_id"),
        F.encode("text", "utf-8").alias("payload"),
        F.struct(
            F.lit("application/octet-stream").alias("mime"),
            F.length(F.encode("text", "utf-8")).cast("long").alias("n_bytes"),
            F.col("source").alias("source"),
        ).alias("meta"),
    )


def extract_features(media: DataFrame, *, decode: str = "fake") -> DataFrame:
    """Decode + feature-extract over binary payloads via ``mapInPandas``.

    ``decode='fake'``: deterministic features (4-bucket byte histogram +
    hex checksum) — exercises the full Arrow batch path end to end.
    ``decode='image'``: requires a real codec (PIL), unavailable here ->
    NotImplementedError, marking exactly where production decode plugs in.
    """
    if decode == "image" and not _HAVE_PIL:
        raise NotImplementedError(
            "image decode requires PIL/pillow, not present in this "
            "environment; the 'fake' path exercises the identical "
            "mapInPandas plumbing"
        )
    if decode not in ("fake", "image"):
        raise ValueError(f"unknown decode mode {decode!r}")

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            payloads = pdf["payload"]
            hists, checks = [], []
            for raw in payloads:
                b = bytes(raw) if raw is not None else b""
                hist = [0, 0, 0, 0]
                for byte in b:
                    hist[byte >> 6] += 1
                hists.append(hist)
                checks.append(format(sum(b) % (1 << 32), "08x"))
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "mime": [m["mime"] for m in pdf["meta"]],
                    "n_bytes": [m["n_bytes"] for m in pdf["meta"]],
                    "byte_histogram": hists,
                    "checksum": checks,
                }
            )

    return media.mapInPandas(batches, schema=FEATURE_SCHEMA)

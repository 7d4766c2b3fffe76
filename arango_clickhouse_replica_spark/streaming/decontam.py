"""Incremental (streaming) fuzzy benchmark decontamination.

The batch query (``decontam_minhash_fuzzy``) sweeps the whole corpus
against the eval set; a training-data INGEST pipeline wants the
streaming shape: flag each arriving document against the (fixed, small)
benchmark suite BEFORE it lands in the corpus, so contaminated documents
never need a retroactive purge.

Shape: the eval set's MinHash lane/band signatures are computed ONCE at
construction (the benchmark suite is static during an ingest run) and
broadcast into every micro-batch; each batch computes its own signatures,
probes the eval bands (bucket-local equi-join), and scores candidates by
8-lane signature agreement — identical arithmetic to the batch query, so
streaming and batch verdicts agree (tests/test_streaming_decontam.py).

Flag output is partitioned by ``batch_id`` so a replayed batch OVERWRITES
its own flags (idempotent under at-least-once delivery, same policy as
streaming/dedup.py). State never grows: unlike incremental dedup there is
no accumulating store — the eval side is constant, so each batch's work
is O(batch), making this the cheapest possible ingest-time gate at 100 TB.

Like streaming/dedup.py, signatures default to UNCAPPED shingles (a
batch cannot see corpus-global df); pass ``hot_shingles`` — the rolling
df sketch's stopword-like shingle list — to apply the batch queries'
``drop_hot_shingles`` discipline to BOTH the eval set and every batch,
making streaming verdicts equal the df-capped ``decontam_minhash_fuzzy``
batch query's exactly (tests/test_streaming_curation.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming import StreamingQuery

from ..operators.minhash import LANES, band_signatures, lane_mins, word_shingles


class StreamingDecontam:
    """foreachBatch-driven ingest-time contamination gate."""

    def __init__(
        self,
        spark: SparkSession,
        eval_docs: DataFrame,
        *,
        flags_dir: str,
        id_col: str = "doc_id",
        text_col: str = "text",
        min_lanes: int = LANES // 2,
        hot_shingles: DataFrame | None = None,
    ) -> None:
        self.spark = spark
        self.flags_dir = flags_dir
        self.id_col = id_col
        self.text_col = text_col
        self.min_lanes = min_lanes
        self._hot = (
            hot_shingles.select("s").localCheckpoint(eager=True)
            if hot_shingles is not None else None
        )
        sh = self._capped(
            word_shingles(eval_docs, id_col=id_col, text_col=text_col)
        )
        # Benchmark suites are tiny and static per run — materialize their
        # signatures once; every batch join below broadcasts them.
        self._eval_mins = lane_mins(sh, id_col=id_col).withColumnRenamed(
            id_col, "eval_doc"
        ).localCheckpoint(eager=True)
        self._eval_bands = band_signatures(sh, id_col=id_col).withColumnRenamed(
            id_col, "eval_doc"
        ).localCheckpoint(eager=True)

    def _capped(self, sh: DataFrame) -> DataFrame:
        if self._hot is not None:
            sh = sh.join(self._hot, "s", "left_anti")
        return sh

    def _score(self, batch: DataFrame) -> DataFrame:
        sh = self._capped(
            word_shingles(batch, id_col=self.id_col, text_col=self.text_col)
        )
        mins = lane_mins(sh, id_col=self.id_col).withColumnRenamed(
            self.id_col, "train_doc"
        )
        bands = band_signatures(sh, id_col=self.id_col).withColumnRenamed(
            self.id_col, "train_doc"
        )
        cand = (
            bands.join(F.broadcast(self._eval_bands), ["band", "sig"])
            .select("train_doc", "eval_doc")
            .distinct()
        )
        mt = mins.select(
            "train_doc", *[F.col(f"m{g}").alias(f"t{g}") for g in range(LANES)]
        )
        me = self._eval_mins.select(
            "eval_doc", *[F.col(f"m{g}").alias(f"e{g}") for g in range(LANES)]
        )
        lanes_eq = None
        for g in range(LANES):
            term = F.when(F.col(f"t{g}") == F.col(f"e{g}"), 1).otherwise(0)
            lanes_eq = term if lanes_eq is None else lanes_eq + term
        return (
            cand.join(mt, "train_doc")
            .join(F.broadcast(me), "eval_doc")
            .select(
                "train_doc",
                "eval_doc",
                lanes_eq.cast("int").alias("lanes_eq"),
                (lanes_eq >= self.min_lanes).alias("contaminated"),
            )
        )

    def process_batch(self, batch: DataFrame, batch_id: int) -> None:
        import os

        self._score(batch).write.mode("overwrite").parquet(
            os.path.join(self.flags_dir, f"batch_id={batch_id}")
        )

    def attach(
        self,
        docs_stream: DataFrame,
        *,
        checkpoint_dir: str,
        available_now: bool = True,
    ) -> StreamingQuery:
        writer = docs_stream.writeStream.foreachBatch(self.process_batch).option(
            "checkpointLocation", checkpoint_dir
        )
        if available_now:
            writer = writer.trigger(availableNow=True)
        return writer.start()

    def all_flags(self) -> DataFrame:
        """Every (train_doc, eval_doc) contamination verdict so far."""
        from pyspark.sql.utils import AnalysisException

        try:
            return (
                self.spark.read.parquet(self.flags_dir)
                .select("train_doc", "eval_doc", "lanes_eq", "contaminated")
                .distinct()
            )
        except AnalysisException:
            return self.spark.createDataFrame(
                [], "train_doc long, eval_doc long, lanes_eq int, contaminated boolean"
            )

"""Incremental (streaming) MinHash-LSH near-dup detection.

The batch dedup queries scan the whole corpus; a training-data INGEST
pipeline needs the streaming shape: as new documents arrive, find their
near-dup candidates against everything already ingested WITHOUT
rescanning the corpus. Classic incremental LSH:

- per micro-batch, compute the batch docs' band signatures
  (operators/minhash.py — same signature the batch query uses);
- candidates = (new vs accumulated signature store) ∪ (new vs new),
  both bucket-local equi-joins on (band, sig);
- append the batch signatures to the store.

State is the signature store — ``bands * |docs|`` tiny rows, NOT the
corpus — partitioned by ``batch_id`` so a replayed batch OVERWRITES its
own signatures and pair outputs (idempotent, like the pipeline's
dead-letter path). At 100 TB the store is the only growing state and is
itself bucketable by (band, sig); the per-batch join touches one
bucket's worth of store rows per new signature.

No document-frequency shingle cap here: the cap needs corpus-global df
(a batch sees only its slice). Production systems maintain a rolling df
sketch for this; documented trade-off.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.streaming import StreamingQuery

from ..operators.minhash import band_signatures, candidate_pairs, word_shingles


class IncrementalLshDedup:
    """foreachBatch-driven incremental near-dup candidate finder."""

    def __init__(
        self,
        spark: SparkSession,
        *,
        store_dir: str,
        pairs_dir: str,
        id_col: str = "doc_id",
        text_col: str = "text",
    ) -> None:
        self.spark = spark
        self.store_dir = store_dir
        self.pairs_dir = pairs_dir
        self.id_col = id_col
        self.text_col = text_col

    def _store(self, exclude_batch: int) -> DataFrame | None:
        if not os.path.isdir(self.store_dir):
            return None
        parts = [
            e for e in os.listdir(self.store_dir)
            if e.startswith("batch_id=") and e != f"batch_id={exclude_batch}"
        ]
        if not parts:
            return None
        return self.spark.read.parquet(
            *[os.path.join(self.store_dir, p) for p in parts]
        )

    def process_batch(self, batch: DataFrame, batch_id: int) -> None:
        sigs = band_signatures(
            word_shingles(batch, id_col=self.id_col, text_col=self.text_col),
            id_col=self.id_col,
        )
        # Signatures are re-read twice below (store join + self join);
        # they are bands-per-doc tiny — materialize once.
        sigs = sigs.localCheckpoint(eager=True)

        store = self._store(exclude_batch=batch_id)
        pairs = candidate_pairs(sigs, id_col=self.id_col)  # new vs new
        if store is not None:
            pairs = pairs.unionByName(
                candidate_pairs(sigs, store, id_col=self.id_col)  # new vs old
            ).distinct()

        pairs.write.mode("overwrite").parquet(
            os.path.join(self.pairs_dir, f"batch_id={batch_id}")
        )
        sigs.write.mode("overwrite").parquet(
            os.path.join(self.store_dir, f"batch_id={batch_id}")
        )

    def attach(
        self, docs_stream: DataFrame, *, checkpoint_dir: str,
        available_now: bool = True,
    ) -> StreamingQuery:
        writer = (
            docs_stream.writeStream.foreachBatch(self.process_batch)
            .option("checkpointLocation", checkpoint_dir)
        )
        if available_now:
            writer = writer.trigger(availableNow=True)
        return writer.start()

    def all_candidates(self) -> DataFrame:
        """Every near-dup candidate pair seen so far (normalized, distinct).

        A stream that has produced no pairs yet (no batches ran, or every
        batch's pair set was empty) leaves nothing for parquet schema
        inference — return an empty typed frame instead of raising.
        """
        from pyspark.sql.utils import AnalysisException

        try:
            return (
                self.spark.read.parquet(self.pairs_dir)
                .select("doc_a", "doc_b")  # drop the batch_id partition column
                .distinct()
            )
        except AnalysisException:
            return self.spark.createDataFrame([], "doc_a long, doc_b long")

"""Incremental ANN-index maintenance under CDC (r13, VERDICT r12 item 2).

ReplacingMergeTree's latest-state promise (reference/readme.md:89-91)
applied to the driver-mandated similarity surface: **index entries are
themselves version-replacing CDC rows**. An embedding upsert arriving
through the CDC path appends ONE entry ``(vec_id, cell, sig, _ver,
_deleted=0)`` — its IVF cell assigned and its LSH sign-signature computed
against FROZEN (train-time) structures, touching only the delta rows —
and a delete appends a tombstone. The live index is ``latest_alive`` over
the entry log, the exact merge-on-read machinery the document tables
already use, so:

- maintenance cost per micro-batch is O(|delta| x K) assignment work —
  never a corpus rescan, never an index rebuild (the pre-r13 gap: at
  100 TB a full ANN rebuild per CDC batch was the one remaining
  scale-killer in the composed CDC+ANN story);
- at-least-once redelivery and arbitrary batch splits are free: the
  entry log is order- and duplicate-insensitive (M5), so replaying a
  batch re-appends identical entries that the version dedup collapses;
- compaction is the same winner-rewrite the CDC store uses, amortized
  and crash-consistent (temp dir + atomic swap).

Centroids and hyperplanes are frozen at train time — the standard
IVF/LSH contract (FAISS ``add``/``remove_ids`` never retrain): an entry
computed at insert time must equal the entry a full rebuild over the
final state would compute, which is exactly the parity the
``ann_incremental_index_parity`` oracle and the streaming twin's pytest
prove.

Scale: centroids are K rows broadcast to every executor; assignment is a
map-side argmax aggregate (shuffle carries |delta| rows, not |delta|*K);
the entry log shuffles 30-byte rows keyed by vec_id only at read time,
and bucketed persistence can remove even that.
"""

from __future__ import annotations

import os
import shutil

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from .blocking import sign_signature
from .cdc import DELETED_COL, VER_COL, latest_alive, latest_state

N_CELLS = 16      # IVF cells — matches ann_ivf_probed's seeding
SIG_BITS = 6      # LSH hyperplane bits — matches ann_lsh_bucketed
DIM = 64

ENTRY_COLS = ("vec_id", "cell", "sig", VER_COL, DELETED_COL)


def _norm(col: F.Column) -> F.Column:
    return F.sqrt(
        F.aggregate(col, F.lit(0.0),
                    lambda a, x: a + x.cast("double") * x.cast("double"))
    )


def _dot(a: F.Column, b: F.Column) -> F.Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0), lambda acc, x: acc + x,
    )


def frozen_centroids(train_emb: DataFrame, n_cells: int = N_CELLS) -> DataFrame:
    """Train-time centroids: first vector of each ``vec_id % K`` class
    (ann_ivf_probed's deterministic seeding) with its norm precomputed.
    FROZEN thereafter — incremental entries and full rebuilds must
    assign against the same centroids or parity is meaningless."""
    w = Window.partitionBy(F.col("vec_id") % n_cells).orderBy("vec_id")
    return (
        train_emb.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .select(
            (F.col("vec_id") % n_cells).cast("int").alias("cell"),
            F.col("embedding").alias("c_emb"),
            _norm(F.col("embedding")).alias("c_nrm"),
        )
    )


def assign_entries(
    upserts: DataFrame,
    centroids: DataFrame,
    bits: int = SIG_BITS,
    dim: int = DIM,
) -> DataFrame:
    """Index entries for a batch of alive upserts ``(vec_id, embedding,
    _ver)``: nearest frozen centroid (cosine argmax, lowest-cell
    tiebreak) + the LSH sign-signature. Broadcast argmax — one
    map-side-combinable max-struct aggregate, so the shuffle carries
    |delta| rows, not |delta| x K (the embed_ops._assign shape)."""
    e = upserts.select(
        "vec_id",
        F.col("embedding"),
        F.col(VER_COL).cast("long").alias(VER_COL),
        _norm(F.col("embedding")).alias("__nrm"),
        sign_signature(F.col("embedding"), bits, dim).alias("__sig"),
    )
    d = e.crossJoin(F.broadcast(centroids)).withColumn(
        "__c_sim",
        _dot(F.col("embedding"), F.col("c_emb"))
        / (F.col("__nrm") * F.col("c_nrm")),
    )
    # group by (vec_id, _ver): one CDC batch can carry SEVERAL versions
    # of the same key (a base row and its re-embed split across files,
    # or an at-least-once replay) — each version gets its own entry and
    # the downstream latest_state merge picks the winner. Keying on
    # vec_id alone would collapse versions by similarity, silently
    # resurrecting a superseded vector.
    best = d.groupBy("vec_id", VER_COL).agg(
        F.max(
            F.struct(
                F.col("__c_sim").alias("s"),
                (-F.col("cell")).alias("neg_cell"),
                F.col("__sig").alias("g"),
            )
        ).alias("mx")
    )
    return best.select(
        "vec_id",
        (-F.col("mx.neg_cell")).cast("int").alias("cell"),
        F.col("mx.g").alias("sig"),
        F.col(VER_COL),
        F.lit(0).alias(DELETED_COL),
    )


def tombstone_entries(deletes: DataFrame) -> DataFrame:
    """Index tombstones for deleted keys ``(vec_id, _ver)``."""
    return deletes.select(
        "vec_id",
        F.lit(None).cast("int").alias("cell"),
        F.lit(None).cast("string").alias("sig"),
        F.col(VER_COL).cast("long").alias(VER_COL),
        F.lit(1).alias(DELETED_COL),
    )


def cdc_index_entries(
    changes: DataFrame,
    centroids: DataFrame,
    bits: int = SIG_BITS,
    dim: int = DIM,
) -> DataFrame:
    """One CDC batch -> its index-entry delta. ``changes`` is the
    post-preprocess CDC shape: ``(vec_id, embedding, _ver, _deleted)``."""
    ups = changes.filter(F.col(DELETED_COL) == 0).select(
        "vec_id", "embedding", VER_COL
    )
    dels = changes.filter(F.col(DELETED_COL) == 1).select("vec_id", VER_COL)
    return assign_entries(ups, centroids, bits, dim).unionByName(
        tombstone_entries(dels)
    )


def live_index(entries: DataFrame) -> DataFrame:
    """The queryable index: latest alive entry per vec_id (M1/M2 applied
    to the entry log)."""
    return latest_alive(entries, ["vec_id"]).select(*ENTRY_COLS[:3], VER_COL)


class AnnIndexStore:
    """Parquet-persisted incremental IVF+LSH index.

    Lifecycle mirrors the CDC target store: ``train`` freezes centroids,
    ``apply_batch`` appends one entry-log generation per micro-batch
    (idempotent per-batch overwrite — a replayed batch rewrites the SAME
    generation), ``live`` is the merge-on-read view, ``compact`` rewrites
    winners as a new generation behind the crash-safe manifest protocol
    (the agg_state.AggregateStateStore pattern): the manifest entry is
    inert until the promoted generation's ``_SUCCESS`` lands, so a crash
    at ANY point either keeps the originals live or retires them — never
    a double-count, never a lost store. Compaction outputs live in their
    own ``compact_id=*`` namespace so a REPLAYED stream batch (which
    idempotently overwrites its own ``batch_id=N`` dir) can never
    clobber a compacted generation."""

    _MANIFEST = "compaction_manifest.json"
    _entry_cols = ENTRY_COLS
    _merge_keys = ("vec_id",)

    def __init__(
        self,
        spark: SparkSession,
        path: str,
        *,
        bits: int = SIG_BITS,
        dim: int = DIM,
        n_cells: int = N_CELLS,
    ) -> None:
        self.spark = spark
        self.path = path
        self.bits = bits
        self.dim = dim
        self.n_cells = n_cells
        os.makedirs(self._entries_root(), exist_ok=True)
        # Recovery: roll back manifest entries whose promoted generation
        # never committed (crash before/during the compaction write);
        # left in place they could be resurrected by a future dir
        # reusing the name and retire live originals.
        entries = self._manifest_entries()
        committed = [
            e for e in entries
            if os.path.exists(os.path.join(
                self._entries_root(), str(e.get("promote")), "_SUCCESS"))
        ]
        if len(committed) != len(entries):
            self._write_manifest(committed)

    def _entries_root(self) -> str:
        return os.path.join(self.path, "entries")

    def _manifest_entries(self) -> list[dict]:
        import json

        try:
            with open(os.path.join(self.path, self._MANIFEST)) as fh:
                return list(json.load(fh).get("compactions", []))
        except (OSError, ValueError, TypeError):
            return []

    def _write_manifest(self, entries: list[dict]) -> None:
        import json

        tmp = os.path.join(self.path, self._MANIFEST + ".tmp")
        with open(tmp, "w") as fh:
            json.dump({"compactions": entries}, fh, sort_keys=True)
        os.replace(tmp, os.path.join(self.path, self._MANIFEST))

    def _retired_names(self) -> set[str]:
        """Generation dirs retired by a COMMITTED compaction (promoted
        generation has ``_SUCCESS``)."""
        root = self._entries_root()
        out: set[str] = set()
        for e in self._manifest_entries():
            if os.path.exists(
                os.path.join(root, str(e.get("promote")), "_SUCCESS")
            ):
                out.update(str(n) for n in e.get("superseded", []))
        return out

    def _live_dirs(self) -> list[str]:
        """Readable generations: committed (``_SUCCESS``) stream batches
        and compaction outputs, minus manifest-retired ones."""
        root = self._entries_root()
        retired = self._retired_names()
        out = []
        for name in sorted(os.listdir(root)):
            if not (name.startswith("batch_id=")
                    or name.startswith("compact_id=")):
                continue
            if name in retired:
                continue
            if not os.path.exists(os.path.join(root, name, "_SUCCESS")):
                continue  # uncommitted garbage from a crashed write
            out.append(os.path.join(root, name))
        return out

    def _centroids_dir(self) -> str:
        return os.path.join(self.path, "centroids")

    def train(self, train_emb: DataFrame) -> None:
        frozen_centroids(train_emb, self.n_cells).write.mode(
            "overwrite"
        ).parquet(self._centroids_dir())

    def centroids(self) -> DataFrame:
        return self.spark.read.parquet(self._centroids_dir())

    def _encode_batch(self, changes: DataFrame, batch_id: int) -> DataFrame:
        """One CDC batch -> this store's entry-log delta (subclasses
        swap the encoding; the generation/manifest machinery is shared).
        ``batch_id`` lets stateful encoders (the graph lane) stamp a
        monotone recompute sequence and exclude their own generation
        when reading prior state (replay exactness)."""
        return cdc_index_entries(changes, self.centroids(), self.bits, self.dim)

    def _entries_excluding(self, name: str) -> DataFrame | None:
        """Entry log restricted to generations other than ``name`` —
        what an encoder must treat as 'prior state' so a REPLAY of
        batch N (whose generation may already exist from the crashed
        attempt) computes against exactly the state the first attempt
        saw. None when no other generation exists yet."""
        parts = [d for d in self._live_dirs() if os.path.basename(d) != name]
        if not parts:
            return None
        return self.spark.read.parquet(*parts).select(*self._entry_cols)

    def apply_batch(self, changes: DataFrame, batch_id: int) -> None:
        # A write into a manifest-retired dir name is either (a) a
        # harmless replay of a batch whose entries the committed
        # compaction already subsumes — invisible by design — or (b) a
        # RESET streaming checkpoint (batch ids restarted at 0), where a
        # genuinely NEW batch's data becomes permanently invisible. The
        # two are indistinguishable by name, so warn loudly instead of
        # silently swallowing: a replay tolerates the warning; a reset
        # checkpoint gets a named symptom instead of vanished data.
        name = f"batch_id={batch_id}"
        if name in self._retired_names():
            import warnings

            warnings.warn(
                f"index store at {self.path}: incoming {name} targets a "
                "manifest-retired generation. If this is a replay of an "
                "already-compacted batch it is harmless (entries stay "
                "subsumed by the compacted generation); if the streaming "
                "checkpoint was RESET, this batch's data will be "
                "invisible — re-point checkpointLocation or seed batch "
                "numbering above the retired ids.",
                RuntimeWarning,
                stacklevel=2,
            )
        self._encode_batch(changes, batch_id).write.mode(
            "overwrite"
        ).parquet(os.path.join(self._entries_root(), name))

    def attach(
        self,
        changes_stream: DataFrame,
        *,
        checkpoint_dir: str,
        available_now: bool = True,
    ):
        """foreachBatch twin: maintain the index live from a streaming
        CDC change feed ``(vec_id, embedding, _ver, _deleted)``. Replays
        are idempotent — a re-delivered batch overwrites its own
        generation and the version dedup absorbs duplicates."""
        writer = (
            changes_stream.writeStream.foreachBatch(
                lambda b, bid: self.apply_batch(b, bid)
            ).option("checkpointLocation", checkpoint_dir)
        )
        if available_now:
            writer = writer.trigger(availableNow=True)
        return writer.start()

    def entries(self) -> DataFrame:
        parts = self._live_dirs()
        if not parts:
            raise ValueError(
                f"no index entries under {self._entries_root()}"
            )
        return self.spark.read.parquet(*parts).select(*self._entry_cols)

    def live(self) -> DataFrame:
        return live_index(self.entries())

    def compact(self) -> None:
        """Rewrite the winner set as one ``compact_id=*`` generation —
        crash-safe at every interruption point (the agg_state protocol):
        GC previously-retired dirs first (so deleting a promoted
        generation later can never deactivate the entry that retired its
        inputs), append the inert manifest entry, write the promoted
        generation (the entry activates only when ``_SUCCESS`` lands),
        then drop the superseded dirs. The winners keep their _ver so
        later CDC rows still compare correctly."""
        root = self._entries_root()
        for e in self._manifest_entries():
            if os.path.exists(
                os.path.join(root, str(e.get("promote")), "_SUCCESS")
            ):
                for name in e.get("superseded", []):
                    d = os.path.join(root, str(name))
                    if os.path.exists(d):
                        shutil.rmtree(d)
        manifest = [
            e for e in self._manifest_entries()
            if any(os.path.exists(os.path.join(root, str(n)))
                   for n in e.get("superseded", []))
        ]
        old = self._live_dirs()
        old_names = [os.path.basename(d) for d in old]
        winners = latest_alive(self.entries(), list(self._merge_keys)).select(
            *self._entry_cols
        )
        nxt = 1 + max(
            (int(n.split("=", 1)[1]) for n in os.listdir(root)
             if n.startswith("compact_id=")),
            default=-1,
        )
        promote = f"compact_id={nxt}"
        manifest.append({"promote": promote, "superseded": old_names})
        self._write_manifest(manifest)
        winners.write.mode("errorifexists").parquet(
            os.path.join(root, promote)
        )
        for d in old:
            shutil.rmtree(d)

    def search(
        self, queries: DataFrame, vectors: DataFrame, top_k: int = 5
    ) -> DataFrame:
        """IVF serving read over the live index: each query ``(query_id,
        q_emb)`` probes its nearest frozen cell; candidates are that
        cell's live entries joined back to ``vectors`` — the CURRENT
        vector store ``(vec_id, embedding)``, i.e. latest_alive of the
        embeddings CDC target. Cost: |Q| x cell-occupancy, independent
        of corpus size; queries must be a bounded set (Q_MAX discipline
        belongs to the caller)."""
        return self._serve(
            queries, self.live().select("vec_id", "cell"), vectors, top_k
        )

    def persist_serving_tables(
        self, vectors: DataFrame, *, prefix: str, buckets: int = 8
    ) -> None:
        """Freeze the current live index and vector state as CO-BUCKETED
        catalog tables (hash-bucketed + sorted on ``vec_id``, same bucket
        count) — the r13 design note made real (VERDICT r13 item 4): the
        serving read's only remaining shuffle was the vec_id join from
        cell candidates to the vector store, and two tables bucketed the
        same way join with NO Exchange on either side. The latest_alive
        merge pays its window shuffle ONCE here (the compaction-style
        amortized cost), after which every serving read is exchange-free
        on the corpus-sized side."""
        from ..plans.layout import write_bucketed

        write_bucketed(
            self.live().select("vec_id", "cell"),
            f"{prefix}_index_live",
            path=os.path.join(self.path, "serving", "index_live"),
            buckets=buckets,
            bucket_cols="vec_id",
            sort_cols="vec_id",
        )
        write_bucketed(
            vectors.select("vec_id", "embedding"),
            f"{prefix}_vectors",
            path=os.path.join(self.path, "serving", "vectors"),
            buckets=buckets,
            bucket_cols="vec_id",
            sort_cols="vec_id",
        )

    def search_bucketed(
        self, queries: DataFrame, *, prefix: str, top_k: int = 5
    ) -> DataFrame:
        """The serving read over the co-bucketed tables written by
        ``persist_serving_tables``: identical results to ``search``, but
        the index->vectors vec_id join reads co-located buckets and
        skips the exchange (tests/test_layout.py asserts the plan)."""
        return self._serve(
            queries,
            self.spark.table(f"{prefix}_index_live"),
            self.spark.table(f"{prefix}_vectors"),
            top_k,
        )

    def _serve(
        self,
        queries: DataFrame,
        live: DataFrame,
        vectors: DataFrame,
        top_k: int,
    ) -> DataFrame:
        cents = F.broadcast(self.centroids())
        q = queries.select(
            "query_id",
            F.col("q_emb"),
            _norm(F.col("q_emb")).alias("q_nrm"),
        )
        qc = (
            q.crossJoin(cents)
            .withColumn(
                "__s",
                _dot(F.col("q_emb"), F.col("c_emb"))
                / (F.col("q_nrm") * F.col("c_nrm")),
            )
            .groupBy("query_id")
            .agg(
                F.max(
                    F.struct(
                        F.col("__s").alias("s"),
                        (-F.col("cell")).alias("neg_cell"),
                        F.col("q_emb").alias("e"),
                        F.col("q_nrm").alias("n"),
                    )
                ).alias("mx")
            )
            .select(
                "query_id",
                (-F.col("mx.neg_cell")).cast("int").alias("cell"),
                F.col("mx.e").alias("q_emb"),
                F.col("mx.n").alias("q_nrm"),
            )
        )
        cand = (
            F.broadcast(qc)
            .join(live.select("vec_id", "cell"), "cell")
            .join(vectors.select("vec_id", "embedding"), "vec_id")
            .filter(F.col("vec_id") != F.col("query_id"))
        )
        scored = cand.withColumn(
            "cos_sim",
            F.round(
                _dot(F.col("q_emb"), F.col("embedding"))
                / (F.col("q_nrm") * _norm(F.col("embedding"))),
                4,
            ),
        )
        w = Window.partitionBy("query_id").orderBy(
            F.desc("cos_sim"), F.asc("vec_id")
        )
        return (
            scored.withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= top_k)
            .select("query_id", F.col("vec_id").alias("neighbor_id"),
                    "cos_sim", "rank")
        )


# ---------------------------------------------------------------------------
# PQ lane (r14, VERDICT r13 item 1a): CDC-incremental product-quantization
# codes. Same contract as the IVF/LSH entries above — codebooks are FROZEN
# at train time (the FAISS IndexPQ add-without-retrain contract), so a code
# computed per-delta at insert time equals the code a full rebuild over the
# final state would compute; the entry log is version-replacing per vec_id.
# Constants mirror queries/embed_ops.py's PQ surface (8 subspaces x 8 dims,
# 16 codes per subspace) so the serving read (ann_pq_adc_rerank's ADC scan)
# can run off the live entry log unchanged.
# ---------------------------------------------------------------------------

PQ_M = 8       # subspaces
PQ_DIM = 8     # dims per subspace
PQ_K = 16      # codes per subspace

PQ_ENTRY_COLS = ("vec_id", "codes", VER_COL, DELETED_COL)


def _l2sq(a: F.Column, b: F.Column) -> F.Column:
    """Sequential-fold squared L2 — bit-identical accumulation order on
    both engines (the embed_ops._l2sq expression)."""
    return F.aggregate(
        F.zip_with(
            a, b,
            lambda x, y: (x.cast("double") - y.cast("double"))
            * (x.cast("double") - y.cast("double")),
        ),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def frozen_pq_codebooks(
    train_emb: DataFrame, m: int = PQ_M, dim: int = PQ_DIM, k: int = PQ_K
) -> DataFrame:
    """Train-time per-subspace codebooks ``(m, k, cv)``: the 16
    deterministic seed vectors (first vector of each ``vec_id % K``
    class — embed_pq_codebooks' seeding) split into M subvectors.
    FROZEN thereafter: incremental encodes and full rebuilds must quantize
    against the same codebooks or parity is meaningless."""
    w = Window.partitionBy(F.col("vec_id") % k).orderBy("vec_id")
    seeds = (
        train_emb.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .select(
            (F.col("vec_id") % k).cast("int").alias("k"),
            F.col("embedding").alias("c_emb"),
        )
    )
    return seeds.select(
        "k",
        F.posexplode(
            F.expr(
                f"transform(sequence(0, {m - 1}),"
                f" mm -> slice(c_emb, {dim} * mm + 1, {dim}))"
            )
        ).alias("m", "cv"),
    )


def pq_encode_entries(
    upserts: DataFrame,
    codebooks: DataFrame,
    m: int = PQ_M,
    dim: int = PQ_DIM,
) -> DataFrame:
    """PQ entry-log rows for a batch of alive upserts ``(vec_id,
    embedding, _ver)``: each vector split into M subvectors, each
    quantized by broadcast squared-L2 argmin against its frozen
    subspace codebook (min of a (d2, k) struct — lexicographic, ties on
    the smaller code, identical to ROW_NUMBER ... ORDER BY d2, k), then
    the M codes packed into one array ordered by subspace. Shuffles
    |delta| x M argmin rows and |delta| packed rows — never the corpus."""
    sv = upserts.select(
        "vec_id",
        F.col(VER_COL).cast("long").alias(VER_COL),
        F.posexplode(
            F.expr(
                f"transform(sequence(0, {m - 1}),"
                f" mm -> slice(embedding, {dim} * mm + 1, {dim}))"
            )
        ).alias("m", "sv"),
    )
    d = sv.join(F.broadcast(codebooks), "m").withColumn(
        "d2", _l2sq(F.col("sv"), F.col("cv"))
    )
    # (vec_id, _ver, m) key: one CDC batch can carry several versions of
    # the same vec_id (at-least-once replay / split re-embed) — each
    # version encodes independently and latest_alive picks the winner.
    codes = (
        d.groupBy("vec_id", VER_COL, "m")
        .agg(F.min(F.struct(F.col("d2"), F.col("k"))).alias("mn"))
        .select("vec_id", VER_COL, "m", F.col("mn.k").alias("code"))
    )
    packed = (
        codes.groupBy("vec_id", VER_COL)
        .agg(
            F.transform(
                F.sort_array(
                    F.collect_list(F.struct(F.col("m"), F.col("code")))
                ),
                lambda s: s["code"],
            ).alias("codes")
        )
    )
    return packed.select(
        "vec_id", "codes", VER_COL, F.lit(0).alias(DELETED_COL)
    )


def pq_tombstones(deletes: DataFrame) -> DataFrame:
    """PQ entry tombstones for deleted keys ``(vec_id, _ver)``."""
    return deletes.select(
        "vec_id",
        F.lit(None).cast("array<int>").alias("codes"),
        F.col(VER_COL).cast("long").alias(VER_COL),
        F.lit(1).alias(DELETED_COL),
    )


def cdc_pq_entries(
    changes: DataFrame,
    codebooks: DataFrame,
    m: int = PQ_M,
    dim: int = PQ_DIM,
) -> DataFrame:
    """One CDC batch -> its PQ-code delta (post-preprocess CDC shape:
    ``(vec_id, embedding, _ver, _deleted)``)."""
    ups = changes.filter(F.col(DELETED_COL) == 0).select(
        "vec_id", "embedding", VER_COL
    )
    dels = changes.filter(F.col(DELETED_COL) == 1).select("vec_id", VER_COL)
    return pq_encode_entries(ups, codebooks, m, dim).unionByName(
        pq_tombstones(dels)
    )


def live_pq_codes(entries: DataFrame) -> DataFrame:
    """The queryable code table: latest alive codes per vec_id."""
    return latest_alive(entries, ["vec_id"]).select("vec_id", "codes", VER_COL)


class PqIndexStore(AnnIndexStore):
    """Parquet-persisted incremental PQ code store: the AnnIndexStore
    generation/manifest/compaction machinery with PQ-code entries.
    ``train`` freezes the codebooks; ``apply_batch`` encodes only the
    delta against them."""

    _entry_cols = PQ_ENTRY_COLS

    def train(self, train_emb: DataFrame) -> None:
        frozen_pq_codebooks(train_emb).write.mode("overwrite").parquet(
            self._centroids_dir()
        )

    def codebooks(self) -> DataFrame:
        return self.spark.read.parquet(self._centroids_dir())

    def _encode_batch(self, changes: DataFrame, batch_id: int) -> DataFrame:
        return cdc_pq_entries(changes, self.codebooks())

    def live(self) -> DataFrame:
        return live_pq_codes(self.entries())


# ---------------------------------------------------------------------------
# Graph lane (r14, VERDICT r13 item 1b): CDC-incremental kNN-graph adjacency.
# The maintained state is each node's bounded out-adjacency (top-GRAPH_DEGREE
# cell-local neighbors by rounded-4dp cosine, id tiebreak — exactly
# ann_graph_beam_topk's edge build). Adjacency depends ONLY on a cell's live
# membership, so a CDC batch invalidates exactly the cells it touches: the
# cells its upserts land in, plus the PRIOR cells of every changed/deleted
# key (a re-embed can migrate cells — both sides recompute). Members of
# touched cells get fresh version-replacing adjacency rows; untouched cells'
# rows stay valid by construction, which is why the incremental state
# hash-matches a full rebuild. Per-batch cost is |touched cells| x
# occupancy^2 with the sub-block cap bounding occupancy — never the corpus.
# Deletes are tombstone-aware twice over: the deleted node's adjacency row
# is tombstoned AND its former cell's survivors recompute without it.
# ---------------------------------------------------------------------------

GRAPH_DEGREE = 4        # out-degree — matches ann_graph_beam_topk's _BEAM_R
GRAPH_CELL_CAP = 500    # sub-block cap for the pair kernel

NODE_COLS = ("vec_id", "cell", "embedding", "nrm", VER_COL, DELETED_COL)
ADJ_COLS = ("src", "cell", "degree", "dst_csv", "dst_sum", "_seq",
            DELETED_COL)


def graph_node_rows(
    changes: DataFrame, centroids: DataFrame
) -> DataFrame:
    """Node-log rows for one CDC batch: alive upserts assigned to their
    nearest frozen cell (broadcast argmax carrying the embedding through
    the struct — the embed_ops._assign shape), deletes as tombstones."""
    ups = changes.filter(F.col(DELETED_COL) == 0).select(
        "vec_id",
        "embedding",
        F.col(VER_COL).cast("long").alias(VER_COL),
        _norm(F.col("embedding")).alias("nrm"),
    )
    d = ups.crossJoin(F.broadcast(centroids)).withColumn(
        "__c_sim",
        _dot(F.col("embedding"), F.col("c_emb"))
        / (F.col("nrm") * F.col("c_nrm")),
    )
    best = d.groupBy("vec_id", VER_COL).agg(
        F.max(
            F.struct(
                F.col("__c_sim").alias("s"),
                (-F.col("cell")).alias("neg_cell"),
                F.col("embedding").alias("e"),
                F.col("nrm").alias("n"),
            )
        ).alias("mx")
    )
    assigned = best.select(
        "vec_id",
        (-F.col("mx.neg_cell")).cast("int").alias("cell"),
        F.col("mx.e").alias("embedding"),
        F.col("mx.n").alias("nrm"),
        F.col(VER_COL),
        F.lit(0).alias(DELETED_COL),
    )
    dels = changes.filter(F.col(DELETED_COL) == 1).select(
        "vec_id",
        F.lit(None).cast("int").alias("cell"),
        F.lit(None).cast("array<float>").alias("embedding"),
        F.lit(None).cast("double").alias("nrm"),
        F.col(VER_COL).cast("long").alias(VER_COL),
        F.lit(1).alias(DELETED_COL),
    )
    return assigned.unionByName(dels)


def graph_touched_cells(
    prior_node_state: DataFrame, node_delta: DataFrame
) -> DataFrame:
    """The cells one batch invalidates: cells its alive rows land in,
    plus the PRIOR cells of every key it changes or deletes (cell
    migration and deletion both shrink the old cell's candidate set).
    A stale row's cell is touched too — recomputing a cell whose
    membership didn't actually change is an idempotent no-op, while
    missing one is a correctness hole. Output: distinct 1-column
    ``cell`` frame — |touched| <= 2x|delta| rows, broadcastable by
    construction."""
    new_cells = (
        node_delta.filter(F.col(DELETED_COL) == 0).select("cell").distinct()
    )
    old_cells = (
        prior_node_state.filter(F.col("cell").isNotNull())
        .join(node_delta.select("vec_id").distinct(), "vec_id")
        .select("cell")
        .distinct()
    )
    return new_cells.unionByName(old_cells).distinct()


def cell_adjacency(
    members: DataFrame,
    seq: int,
    degree: int = GRAPH_DEGREE,
    cell_cap: int = GRAPH_CELL_CAP,
) -> DataFrame:
    """Packed adjacency rows for every member of ``members`` (vec_id,
    cell, embedding, nrm): per source, the top-``degree`` same-cell
    neighbors by round(cos, 4) DESC, dst ASC — ann_graph_beam_topk's
    edge kernel — packed as (degree, dst_csv ordered by rank, dst_sum)
    so one row serves a node's whole neighbor fetch. Members whose cell
    has no other member keep an explicit empty row (their state is
    'no neighbors', not 'unknown'). The pair kernel is sub-block-capped:
    cost |cell|^2 bounded by the cap, never corpus-sized."""
    from .blocking import with_sub_block

    # localCheckpoint the touched membership ONCE: with_sub_block reads
    # its input twice (per-cell count aggregate + probe), the pair
    # kernel joins mb against itself, and the empty-row base below needs
    # (vec_id, cell) — without the checkpoint every reference re-executes
    # the whole upstream (latest_state window + broadcast argmax
    # assignment). The materialized side is only the TOUCHED membership,
    # delta-bounded in production batches (r14 opt round, guide §2.4).
    m0 = members.select("vec_id", "cell", "embedding", "nrm").localCheckpoint(
        eager=False
    )
    mb = with_sub_block(
        m0, label_col="cell", label_cap=cell_cap
    ).localCheckpoint(eager=False)
    a, b = mb.alias("a"), mb.alias("b")
    pair = F.round(
        _dot(F.col("a.embedding"), F.col("b.embedding"))
        / (F.col("a.nrm") * F.col("b.nrm")),
        4,
    )
    w_src = Window.partitionBy("src").orderBy(F.desc("sim"), F.asc("dst"))
    edges = (
        a.join(
            b,
            (F.col("a.cell") == F.col("b.cell"))
            & (F.col("a.sub") == F.col("b.sub"))
            & (F.col("a.vec_id") != F.col("b.vec_id")),
        )
        .select(
            F.col("a.vec_id").alias("src"),
            F.col("b.vec_id").alias("dst"),
            pair.alias("sim"),
        )
        .withColumn("rn", F.row_number().over(w_src))
        .filter(F.col("rn") <= degree)
    )
    packed = edges.groupBy("src").agg(
        F.count("*").cast("int").alias("degree"),
        F.array_join(
            F.transform(
                F.sort_array(F.collect_list(F.struct("rn", "dst"))),
                lambda s: s["dst"].cast("string"),
            ),
            ",",
        ).alias("dst_csv"),
        F.sum("dst").cast("long").alias("dst_sum"),
    )
    # The empty-row base reads the CHECKPOINTED membership instead of
    # re-referencing ``members`` (same rows — the second reference used
    # to re-execute the whole upstream merge + semi-join per patch).
    return (
        m0.select(F.col("vec_id").alias("src"), "cell")
        .join(packed, "src", "left")
        .select(
            "src",
            "cell",
            F.coalesce(F.col("degree"), F.lit(0)).cast("int").alias("degree"),
            F.coalesce(F.col("dst_csv"), F.lit("")).alias("dst_csv"),
            F.coalesce(F.col("dst_sum"), F.lit(0)).cast("long").alias("dst_sum"),
            F.lit(seq).cast("long").alias("_seq"),
            F.lit(0).alias(DELETED_COL),
        )
    )


def adjacency_tombstones(deleted_keys: DataFrame, seq: int) -> DataFrame:
    """Adjacency tombstones for keys deleted in this batch (column
    ``vec_id``)."""
    return deleted_keys.select(
        F.col("vec_id").alias("src"),
        F.lit(None).cast("int").alias("cell"),
        F.lit(None).cast("int").alias("degree"),
        F.lit(None).cast("string").alias("dst_csv"),
        F.lit(None).cast("long").alias("dst_sum"),
        F.lit(seq).cast("long").alias("_seq"),
        F.lit(1).alias(DELETED_COL),
    )


def graph_adjacency_patch(
    prior_node_state: DataFrame,
    node_delta: DataFrame,
    seq: int,
    degree: int = GRAPH_DEGREE,
    cell_cap: int = GRAPH_CELL_CAP,
    merged: DataFrame | None = None,
) -> DataFrame:
    """One batch's adjacency delta: fresh rows for every live member of
    a touched cell (computed against the post-batch membership) plus
    adjacency tombstones for delta keys whose MERGED state is deleted.
    ``prior_node_state`` must be the latest_STATE view (tombstones
    KEPT): feeding the alive view here lets a stale base row arriving
    AFTER its delete resurrect the node in the recompute membership —
    the version comparison needs the tombstone to win. Tombstones are
    likewise derived from the merged state, not the delta's _deleted
    flags, so a stale alive row for an already-deleted key re-asserts
    the tombstone instead of leaving a dangling adjacency row. ``_seq``
    must be monotone across batches (the stream's batch id) — a later
    recompute of the same src supersedes an earlier one by plain
    version comparison.

    ``merged`` (r15): optionally the PRECOMPUTED
    ``latest_state(prior_node_state ∪ node_delta, ["vec_id"])`` — the
    caller guarantees that equality (typically by materializing the
    merge once and sharing it with its own consumers, e.g. the serving
    read's post-CDC vector state, which IS this relation). When given,
    the patch derives both its recompute membership and its tombstone
    keys from it instead of re-running the corpus-sized version window
    per lane (guide §2.4)."""
    if merged is None:
        all_rows = prior_node_state.select(*NODE_COLS).unionByName(
            node_delta.select(*NODE_COLS)
        )
        merged = latest_state(all_rows, ["vec_id"])
        # Tombstones need the merged state of DELTA KEYS only, and
        # per-key latest state depends only on that key's rows —
        # restrict to the delta's keys BEFORE the version window (r14
        # opt round): a full-``merged`` reference re-executed the
        # corpus-sized merge a second time to answer a delta-bounded
        # question.
        dels = (
            latest_state(
                all_rows.join(
                    node_delta.select("vec_id").distinct(),
                    "vec_id", "left_semi",
                ),
                ["vec_id"],
            )
            .filter(F.col(DELETED_COL) == 1)
            .select("vec_id")
        )
    else:
        merged = merged.select(*NODE_COLS)
        # The caller materialized the merge — the delta-key restriction
        # commutes with the per-key window, so reading the merged
        # relation directly is the same rows with zero extra windows.
        dels = (
            merged.join(
                node_delta.select("vec_id").distinct(), "vec_id", "left_semi"
            )
            .filter(F.col(DELETED_COL) == 1)
            .select("vec_id")
        )
    after = merged.filter(F.col(DELETED_COL) == 0)
    touched = graph_touched_cells(prior_node_state, node_delta)
    members = after.join(F.broadcast(touched), "cell", "left_semi")
    recomputed = cell_adjacency(members, seq, degree, cell_cap)
    return recomputed.unionByName(adjacency_tombstones(dels, seq))


def live_adjacency(adj_rows: DataFrame) -> DataFrame:
    """The queryable graph: latest alive adjacency per source."""
    return latest_alive(adj_rows, ["src"], ver_col="_seq").select(
        "src", "cell", "degree", "dst_csv", "dst_sum", "_seq"
    )


GRAPH_ENTRY_COLS = (
    "kind", "vec_id", "cell", "embedding", "nrm",
    "degree", "dst_csv", "dst_sum", VER_COL, DELETED_COL,
)

_NODE_SCHEMA = (
    "vec_id bigint, cell int, embedding array<float>, nrm double, "
    f"{VER_COL} bigint, {DELETED_COL} int"
)


class GraphIndexStore(AnnIndexStore):
    """Parquet-persisted incremental kNN-graph: ONE version-replacing
    entry log holding two row kinds keyed ``(kind, vec_id)`` —
    ``node`` rows (cell assignment + embedding, versioned by the CDC
    ``_ver``) and ``adj`` rows (the packed out-adjacency, versioned by
    the monotone batch id: a later recompute of the same source
    supersedes an earlier one by plain version comparison). One
    generation per micro-batch carries the node delta AND the
    touched-cell adjacency patch, so the generation/manifest/compaction
    machinery is inherited unchanged; replay exactness holds because the
    encoder reads prior state EXCLUDING its own generation
    (``_entries_excluding``) — a replayed batch sees exactly what the
    first attempt saw."""

    _entry_cols = GRAPH_ENTRY_COLS
    _merge_keys = ("kind", "vec_id")

    def __init__(self, spark, path, *, degree: int = GRAPH_DEGREE,
                 cell_cap: int = GRAPH_CELL_CAP, n_cells: int = N_CELLS):
        super().__init__(spark, path, n_cells=n_cells)
        self.degree = degree
        self.cell_cap = cell_cap

    def _prior_node_state(self, excluding: str) -> DataFrame:
        """Latest node STATE (tombstones kept — graph_adjacency_patch's
        resurrection defense needs them) from every generation except
        ``excluding``."""
        prior = self._entries_excluding(excluding)
        if prior is None:
            return self.spark.createDataFrame([], _NODE_SCHEMA)
        return latest_state(
            prior.filter(F.col("kind") == "node").select(*NODE_COLS),
            ["vec_id"],
        )

    def _encode_batch(self, changes: DataFrame, batch_id: int) -> DataFrame:
        prior_nodes = self._prior_node_state(f"batch_id={batch_id}")
        delta = graph_node_rows(changes, self.centroids())
        patch = graph_adjacency_patch(
            prior_nodes, delta, seq=batch_id,
            degree=self.degree, cell_cap=self.cell_cap,
        )
        node_rows = delta.select(
            F.lit("node").alias("kind"),
            "vec_id", "cell", "embedding", "nrm",
            F.lit(None).cast("int").alias("degree"),
            F.lit(None).cast("string").alias("dst_csv"),
            F.lit(None).cast("long").alias("dst_sum"),
            F.col(VER_COL), F.col(DELETED_COL),
        )
        adj_rows = patch.select(
            F.lit("adj").alias("kind"),
            F.col("src").alias("vec_id"),
            "cell",
            F.lit(None).cast("array<float>").alias("embedding"),
            F.lit(None).cast("double").alias("nrm"),
            "degree", "dst_csv", "dst_sum",
            F.col("_seq").alias(VER_COL),
            F.col(DELETED_COL),
        )
        return node_rows.unionByName(adj_rows)

    def live_nodes(self) -> DataFrame:
        return latest_alive(
            self.entries().filter(F.col("kind") == "node").select(*NODE_COLS),
            ["vec_id"],
        )

    def live(self) -> DataFrame:
        """The queryable graph: latest alive packed adjacency per src."""
        adj = self.entries().filter(F.col("kind") == "adj").select(
            F.col("vec_id").alias("src"),
            "cell", "degree", "dst_csv", "dst_sum",
            F.col(VER_COL).alias("_seq"),
            F.col(DELETED_COL),
        )
        return live_adjacency(adj)

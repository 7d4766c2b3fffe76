"""CDC apply kernel + ReplacingMergeTree-style latest-state semantics.

Re-expresses the reference's consumer pre-processing and its target-table
merge semantics as pure DataFrame transforms:

- ``preprocess_envelopes``: op-type/collection filter (P1,
  replication/producer/publisher.py:54-58), tombstone drop (P2,
  replication/consumer/loader.py:52-53), tick-cutoff replay filter (P3,
  loader.py:56-61), ``_ver`` stamp (D1, loader.py:76) and ``_deleted``
  flag (D2, loader.py:77), projection to the document payload (P5,
  loader.py:68,79).
- ``latest_state`` / ``latest_alive``: the ClickHouse
  ``ReplacingMergeTree(_ver)`` merge (M1, tables/test.yaml:13,
  readme.md:89-91) — keep the max-``_ver`` row per key — plus the
  query-time soft-delete filter (P6/M2, loader.py:77).
- ``merge_upsert``: the idempotent micro-batch merge used by the
  streaming sink (T2) and the snapshot-overlap resolution (M4,
  replication/replicator/store.py:51-58): append-only union then
  version dedup, so replays and snapshot/CDC overlap are absorbed.

Scale notes (100 TB): the dedup is a single hash-partition shuffle on the
key columns followed by a per-key top-1 — Spark plans max_by-style
``row_number() = 1`` with partial aggregation disabled but AQE skew-split
enabled; for hot keys the shuffle salt lives in the key hash itself (a
document key space is naturally high-cardinality). Periodic compaction
(``compact``) rewrites a table keeping only winners, bounding the
merge-on-read cost exactly like ClickHouse background merges (M3,
clickhouse/connect.py:55-57).

Determinism: ``_ver`` derives from the WAL tick — NOT wall-clock. The
reference stamps ``int(f"{utcnow:%Y%j}{offset}")`` (loader.py:76) which
mixes ingestion day into the version; we keep the monotone source token
only, which preserves per-key monotonicity and makes replays idempotent.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

# WAL op codes (replication/producer/reader.py:9-14)
UPSERT_DOCUMENT = 2300
REMOVE_DOCUMENT = 2302
TXN_MARKERS = (2200, 2201, 2202)  # filtered out (publisher.py:54-58)

VER_COL = "_ver"
DELETED_COL = "_deleted"


def preprocess_envelopes(
    env: DataFrame,
    *,
    tracked_cuids: Sequence[str] | None = None,
    initial_tick: int | None = None,
    doc_col: str = "data",
    tick_col: str = "tick",
    type_col: str = "type",
    cuid_col: str = "cuid",
) -> DataFrame:
    """WAL envelope stream -> typed change rows ready for the mapping DSL.

    Output: the payload struct fields of ``doc_col`` flattened, plus
    ``_ver`` (monotone version from the tick) and ``_deleted``.
    """
    df = env
    # P1: keep only document upserts/removes; drop txn markers & untracked
    keep = F.col(type_col).isin(UPSERT_DOCUMENT, REMOVE_DOCUMENT)
    if tracked_cuids is not None:
        keep = keep & F.col(cuid_col).isin(list(tracked_cuids))
    df = df.filter(keep)
    # P2: tombstone filter (null payload)
    df = df.filter(F.col(doc_col).isNotNull())
    # P3: replay cutoff after a snapshot (tick recorded before snapshot read)
    if initial_tick is not None:
        df = df.filter(F.col(tick_col).cast("long") >= F.lit(int(initial_tick)))
    # D1 + D2: deterministic version from the WAL position; soft-delete flag
    df = df.withColumn(VER_COL, F.col(tick_col).cast("long")).withColumn(
        DELETED_COL,
        F.when(F.col(type_col) == REMOVE_DOCUMENT, F.lit(1)).otherwise(F.lit(0)),
    )
    # P5: project payload + metadata
    return df.select(F.col(f"{doc_col}.*"), F.col(VER_COL), F.col(DELETED_COL))


def latest_state(
    df: DataFrame,
    keys: Sequence[str],
    ver_col: str = VER_COL,
    tiebreakers: Sequence[Column | str] = (),
) -> DataFrame:
    """ReplacingMergeTree(_ver) merge-on-read view: max-version row per key.

    Order-insensitive (M5): correctness never depends on arrival order,
    only on the version, so repartitioning/shuffling freely is safe.
    """
    order = [F.col(ver_col).desc(), F.col(DELETED_COL).desc()] if DELETED_COL in df.columns else [
        F.col(ver_col).desc()
    ]
    order += [F.col(t).desc() if isinstance(t, str) else t for t in tiebreakers]
    w = Window.partitionBy(*[F.col(k) for k in keys]).orderBy(*order)
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn")
    )


def latest_alive(
    df: DataFrame,
    keys: Sequence[str],
    ver_col: str = VER_COL,
) -> DataFrame:
    """The queryable latest-state view: winners minus soft-deleted rows
    (P6 — reads must exclude ``_deleted=1``, readme.md:91)."""
    out = latest_state(df, keys, ver_col)
    if DELETED_COL in out.columns:
        out = out.filter(F.col(DELETED_COL) == 0)
    return out


def merge_upsert(
    target: DataFrame | None,
    batch: DataFrame,
    keys: Sequence[str],
    ver_col: str = VER_COL,
) -> DataFrame:
    """Idempotent micro-batch merge: union-by-name then version dedup.

    Equivalent to Delta ``MERGE ... WHEN MATCHED AND s._ver > t._ver`` but
    storage-agnostic; because M1 is order- and duplicate-insensitive,
    at-least-once redelivery (T2/T3) and snapshot-overlap (M4) both
    collapse to no-ops.
    """
    merged = batch if target is None else target.unionByName(batch, allowMissingColumns=True)
    return latest_state(merged, keys, ver_col)


def compact(df: DataFrame, keys: Sequence[str], ver_col: str = VER_COL) -> DataFrame:
    """Forced compaction (M3 — OPTIMIZE TABLE FINAL analog): materialize
    only the winning rows, typically followed by a parquet rewrite
    partitioned/sorted by the key for locality (tables/test.yaml:14-16's
    ORDER BY + index_granularity)."""
    return latest_state(df, keys, ver_col)


# WAL transaction markers (replication/producer/reader.py:9-14):
# 2200 = begin, 2201 = commit, 2202 = abort. The reference's reader
# filters them out and applies documents immediately; the atomic-apply
# mode below uses them to gate visibility on COMMIT instead.
TXN_BEGIN = 2200
TXN_COMMIT = 2201
TXN_ABORT = 2202


class TxnSplit:
    """Three-way split of an envelope set by transaction outcome."""

    __slots__ = ("applyable", "deferred", "aborted")

    def __init__(self, applyable: DataFrame, deferred: DataFrame,
                 aborted: DataFrame) -> None:
        self.applyable = applyable
        self.deferred = deferred
        self.aborted = aborted


def txn_atomic_split(
    env: DataFrame,
    *,
    tid_col: str = "tid",
    type_col: str = "type",
    tick_col: str = "tick",
) -> TxnSplit:
    """Partition envelope DOCUMENT rows by their transaction's outcome.

    - ``applyable``: rows whose ``tid`` has a COMMIT marker in ``env``,
      plus non-transactional rows (null/absent ``tid``) — safe to apply.
    - ``deferred``: rows of transactions with NO terminator yet (the
      micro-batch cut mid-transaction) — carry to the next batch.
    - ``aborted``: rows of transactions whose last marker is ABORT —
      must never reach the target.

    In WAL order a transaction's document rows precede its terminator,
    so a commit marker in hand implies every row of that transaction is
    either in this envelope set or in the pending buffer unioned into
    it — markers never need to be remembered across batches. The
    committed/aborted tid relations are bounded by the number of
    transactions TERMINATING in the batch (broadcast joins); the
    deferred set is bounded by transactions in flight at the batch cut,
    never by stream volume.
    """
    is_doc = F.col(type_col).isin(UPSERT_DOCUMENT, REMOVE_DOCUMENT)
    docs = env.filter(is_doc)
    # last marker wins per tid (max tick; abort beats commit on a tie —
    # a tid is never legally terminated twice)
    terminators = (
        env.filter(F.col(type_col).isin(TXN_COMMIT, TXN_ABORT))
        .filter(F.col(tid_col).isNotNull())
        .groupBy(tid_col)
        .agg(
            F.max_by(F.col(type_col), F.struct(
                F.col(tick_col).cast("long"), F.col(type_col)
            )).alias("__term")
        )
    )
    tagged = docs.join(
        F.broadcast(terminators.withColumnRenamed(tid_col, "__tid")),
        F.col(tid_col) == F.col("__tid"),
        "left",
    )
    applyable = tagged.filter(
        F.col(tid_col).isNull() | (F.col("__term") == TXN_COMMIT)
    ).drop("__tid", "__term")
    deferred = tagged.filter(
        F.col(tid_col).isNotNull() & F.col("__term").isNull()
    ).drop("__tid", "__term")
    aborted = tagged.filter(F.col("__term") == TXN_ABORT).drop(
        "__tid", "__term"
    )
    return TxnSplit(applyable, deferred, aborted)

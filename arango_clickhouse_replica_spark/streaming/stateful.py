"""Custom stateful streaming operators (applyInPandasWithState).

The built-in windowed aggregations (streaming/windows.py) cover the
reference's event-time surface; these operators cover what built-ins
can't express:

- ``streaming_first_seen``: cross-batch exact dedup — emit a key's row
  only the FIRST time it is ever seen. The streaming analogue of the
  batch fingerprint dedup (text_fingerprint_dedup): run it on a document
  stream keyed by content fingerprint and the sink receives each unique
  document exactly once, no matter how often the crawler re-delivers.
  (``dropDuplicates`` on a stream keeps state too but cannot bound or
  inspect it per key, and ``dropDuplicatesWithinWatermark`` forgets;
  this operator owns its state explicitly.)
- ``streaming_running_totals``: per-key running count/sum emitted every
  micro-batch (update mode) — the live per-table ingest counters the
  reference keeps in Redis (``publisher.py:24-46``), kept in the state
  store instead.

Scale notes (100 TB stream): state is hash-partitioned by key across
executors (same shuffle as any groupBy); each micro-batch touches only
the keys present in that batch. Arrow moves rows to Python in batches —
the grouped-map path is vectorized, not row-at-a-time. State per key is
O(1) (a flag / two counters). For unbounded key spaces set a TTL via
``GroupStateTimeout.ProcessingTimeTimeout`` so dead keys age out.
"""

from __future__ import annotations

from collections.abc import Iterable, Sequence

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout


def streaming_first_seen(
    df: DataFrame,
    key_cols: str | Sequence[str],
    *,
    state_ttl_ms: int | None = None,
) -> DataFrame:
    """Emit each key's first-ever row; suppress all later arrivals.

    Works on a streaming DataFrame grouped by ``key_cols``; output schema
    equals the input schema. With ``state_ttl_ms`` set, a key's memory
    ages out after that long without arrivals (bounded state for
    unbounded key spaces — re-arrivals after expiry re-emit).
    """
    keys = [key_cols] if isinstance(key_cols, str) else list(key_cols)
    out_schema = df.schema
    state_schema = T.StructType([T.StructField("seen", T.BooleanType())])
    ttl = (
        GroupStateTimeout.ProcessingTimeTimeout
        if state_ttl_ms is not None
        else GroupStateTimeout.NoTimeout
    )

    def dedup(
        key: tuple, pdfs: Iterable[pd.DataFrame], state: GroupState
    ) -> Iterable[pd.DataFrame]:
        if state.hasTimedOut:
            state.remove()
            return
        if state.exists:
            for _ in pdfs:  # drain; key already emitted
                pass
            if state_ttl_ms is not None:
                state.setTimeoutDuration(state_ttl_ms)
            return
        first = None
        for pdf in pdfs:
            if first is None and len(pdf):
                first = pdf.iloc[:1]
        state.update((True,))
        if state_ttl_ms is not None:
            state.setTimeoutDuration(state_ttl_ms)
        if first is not None:
            yield first

    return df.groupBy(*keys).applyInPandasWithState(
        dedup, out_schema, state_schema, "update", ttl
    )


def streaming_running_totals(
    df: DataFrame,
    key_col: str,
    value_col: str,
) -> DataFrame:
    """Per-key lifetime (count, sum) re-emitted on every batch the key
    appears in — update-mode live counters."""
    out_schema = T.StructType(
        [
            T.StructField(key_col, df.schema[key_col].dataType),
            T.StructField("n", T.LongType()),
            T.StructField("total", T.DoubleType()),
        ]
    )
    state_schema = T.StructType(
        [T.StructField("n", T.LongType()), T.StructField("total", T.DoubleType())]
    )

    def totals(
        key: tuple, pdfs: Iterable[pd.DataFrame], state: GroupState
    ) -> Iterable[pd.DataFrame]:
        n, total = state.get if state.exists else (0, 0.0)
        for pdf in pdfs:
            n += len(pdf)
            total += float(pdf[value_col].sum())
        state.update((n, total))
        yield pd.DataFrame({key_col: [key[0]], "n": [n], "total": [total]})

    return df.groupBy(key_col).applyInPandasWithState(
        totals, out_schema, state_schema, "update", GroupStateTimeout.NoTimeout
    )


def streaming_dataset_card(df: DataFrame) -> DataFrame:
    """Live dataset-card counters over a streaming ``documents`` feed:
    per (source, lang) stratum, lifetime document / estimated-token /
    character totals re-emitted on every batch the stratum appears in —
    the streaming face of the batch ``curation_dataset_card`` query.

    The token estimate (``greatest(1, n_chars // 4)``) is projected
    JVM-side BEFORE the stateful operator, so Python only sums three
    integer columns per Arrow batch. State per stratum is three counters
    (O(1)); strata are hash-partitioned, so 1000 executors hold disjoint
    slices. The batch card's ``distinct_docs``/``dup_rate`` column is
    deliberately absent here: exact distinct is not an O(1)-mergeable
    counter — production systems bolt an HLL sketch into this same state
    slot, and the batch query stays the exact source of truth.
    """
    projected = df.select(
        "source",
        "lang",
        F.col("n_chars").cast("long").alias("n_chars"),
        F.greatest(F.lit(1), (F.col("n_chars") / 4).cast("long"))
        .cast("long")
        .alias("est_tokens"),
    )
    out_schema = T.StructType(
        [
            T.StructField("source", T.StringType()),
            T.StructField("lang", T.StringType()),
            T.StructField("n_docs", T.LongType()),
            T.StructField("total_tokens", T.LongType()),
            T.StructField("total_chars", T.LongType()),
        ]
    )
    state_schema = T.StructType(
        [
            T.StructField("n_docs", T.LongType()),
            T.StructField("total_tokens", T.LongType()),
            T.StructField("total_chars", T.LongType()),
        ]
    )

    def card(
        key: tuple, pdfs: Iterable[pd.DataFrame], state: GroupState
    ) -> Iterable[pd.DataFrame]:
        n, toks, chars = state.get if state.exists else (0, 0, 0)
        for pdf in pdfs:
            n += len(pdf)
            toks += int(pdf["est_tokens"].sum())
            chars += int(pdf["n_chars"].sum())
        state.update((n, toks, chars))
        yield pd.DataFrame(
            {
                "source": [key[0]],
                "lang": [key[1]],
                "n_docs": [n],
                "total_tokens": [toks],
                "total_chars": [chars],
            }
        )

    return projected.groupBy("source", "lang").applyInPandasWithState(
        card, out_schema, state_schema, "update", GroupStateTimeout.NoTimeout
    )


def make_user_stats_processor(key_col: str, value_col: str):
    """Build the ``StatefulProcessor`` behind ``streaming_user_stats_tws``.

    Module-level (not a closure inside the operator) so the processor's
    state-transition logic is testable against the ``StatefulProcessor``
    contract directly — ``init(handle)`` / ``handleInputRows`` /
    ``close()`` driven with a fake handle — in environments where the
    JVM<->Python state protocol (google.protobuf) is unavailable. The
    streaming wrapper below passes an instance straight to
    ``transformWithStateInPandas``; Spark itself calls exactly the same
    three methods, so the fake-handle drive exercises the identical code
    path minus the wire protocol.
    """
    from pyspark.sql.streaming.stateful_processor import (
        StatefulProcessor,
        StatefulProcessorHandle,
    )

    class UserStats(StatefulProcessor):
        def init(self, handle: StatefulProcessorHandle) -> None:
            self._stats = handle.getValueState(
                "stats", "n long, total double, vmax double"
            )

        def handleInputRows(self, key, rows, timerValues):
            n, total, vmax = (
                tuple(self._stats.get()) if self._stats.exists() else (0, 0.0, None)
            )
            for pdf in rows:
                if not len(pdf):
                    continue
                n += len(pdf)
                total += float(pdf[value_col].sum())
                batch_max = float(pdf[value_col].max())
                vmax = batch_max if vmax is None else max(vmax, batch_max)
            self._stats.update((n, total, vmax))
            yield pd.DataFrame(
                {key_col: [key[0]], "n": [n], "total": [total], "vmax": [vmax]}
            )

        def close(self) -> None:
            pass

    return UserStats()


def streaming_user_stats_tws(df: DataFrame, key_col: str, value_col: str) -> DataFrame:
    """Per-key lifetime (n, total, vmax) on the NEW Spark 4 stateful API
    (``transformWithStateInPandas``): explicit typed state variables via
    ``StatefulProcessorHandle`` instead of the single opaque tuple
    ``applyInPandasWithState`` allows. Functionally parallel to
    ``streaming_running_totals`` (kept above — the older API remains the
    wider-deployed one); this variant is the forward path: per-variable
    state (ValueState/ListState/MapState), native TTL, and timers all
    hang off the same handle.

    Scale: identical state-store profile to any keyed stateful op — one
    shuffle on the key, O(1) state per key, Arrow-batched transfer.

    Runtime requirements for the full streaming path: the RocksDB state
    store provider (``spark.sql.streaming.stateStore.providerClass``) and
    ``google.protobuf`` (the JVM<->Python state protocol). Where protobuf
    is absent the processor's state logic is still covered end to end by
    the fake-handle contract drive in tests/test_streaming_stateful.py
    (see :func:`make_user_stats_processor`).
    """
    out_schema = T.StructType(
        [
            T.StructField(key_col, df.schema[key_col].dataType),
            T.StructField("n", T.LongType()),
            T.StructField("total", T.DoubleType()),
            T.StructField("vmax", T.DoubleType()),
        ]
    )
    return df.groupBy(key_col).transformWithStateInPandas(
        make_user_stats_processor(key_col, value_col),
        out_schema, "Update", "None",
    )

"""Data-loss monitoring on the envelope stream (SURVEY §2.10 A2).

The reference's only data-loss alarm: after asking the WAL tail to resume
from ``last_tick``, it logs ``'ticks lost asked for X but got Y'`` when
the server no longer holds that position
(``/root/reference/replication/producer/publisher.py:140-141`` — the
``from_present`` flag). The Spark analog watches the envelope stream's
tick range per micro-batch: if a batch starts past the last position we
processed (+1), the ticks in between were lost upstream (WAL truncation,
envelope files deleted, broker retention).

The check is two scalar aggregates per micro-batch (min/max of ``tick``)
— a driver-side probe whose cost does not scale with the data, run on
the RAW envelope batch before op-type filtering (transaction markers
2200/2201/2202 occupy ticks too, so the raw stream is where tick space
is dense).
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Callable

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


@dataclass(frozen=True)
class TickGap:
    batch_id: int
    expected_from: int  # last processed tick + 1
    observed_from: int  # first tick the batch actually delivered
    missing: int        # ticks lost in between


@dataclass(frozen=True)
class BatchProgress:
    """One micro-batch's progress record — the analog of the reference's
    per-batch log line ``'processed {tick_start}-{last_included}: overall
    {N} docs'`` (publisher.py:155-156)."""

    batch_id: int
    tick_from: int
    tick_to: int
    n_envelopes: int


@dataclass
class TickGapMonitor:
    """Per-micro-batch tick-continuity check (A2).

    ``on_gap`` is called for every detected gap (default: collected in
    ``gaps``); the monitor also keeps the running ``last_tick`` high-water
    mark, the analog of the reference's Redis ``last processed tick``
    (publisher.py:130-131).
    """

    tick_col: str = "tick"
    on_gap: Callable[[TickGap], None] | None = None
    last_tick: int | None = None
    gaps: list[TickGap] = field(default_factory=list)
    progress: list[BatchProgress] = field(default_factory=list)

    def observe(self, batch: DataFrame, batch_id: int) -> TickGap | None:
        row = batch.agg(
            F.min(F.col(self.tick_col).cast("long")).alias("mn"),
            F.max(F.col(self.tick_col).cast("long")).alias("mx"),
            F.count("*").alias("n"),
        ).first()
        if row is None or row.mn is None:
            return None  # empty batch
        self.progress.append(
            BatchProgress(
                batch_id=batch_id, tick_from=row.mn, tick_to=row.mx,
                n_envelopes=row.n,
            )
        )
        gap = None
        if self.last_tick is not None and row.mn > self.last_tick + 1:
            gap = TickGap(
                batch_id=batch_id,
                expected_from=self.last_tick + 1,
                observed_from=row.mn,
                missing=row.mn - self.last_tick - 1,
            )
            self.gaps.append(gap)
            if self.on_gap is not None:
                self.on_gap(gap)
        self.last_tick = max(self.last_tick or 0, row.mx)
        return gap

"""Driver-side job overlap for composed queries (guide §2.6).

Spark happily runs several jobs at once inside one application; actions
are only sequential because driver code calls them sequentially. The
composed audit/serving queries here materialize several INDEPENDENT
bounded intermediates with eager ``localCheckpoint`` calls — each of
which is a synchronous job barrier, so N independent materializations
cost N serialized (job + AQE-planning gap) rounds while most cores idle
(the r14 profile of the incremental serving read: 13.7 s of job time vs
19.8 s of inter-job gaps). Submitting those materializations from a
small thread pool lets each job's tasks back-fill executors freed by the
others' tails, and lets the driver plan one query stage while another
executes.

Scale note: this changes WHEN jobs run, never what they compute — each
thunk still builds the exact relation it built sequentially. At 100 TB
the overlapped jobs are the same delta-/Q-bounded materializations; the
pool is capped small (guide §2.6: "2-3 jobs in flight is plenty") so
corpus-sized lanes cannot gang up on executor memory.
"""

from __future__ import annotations

import os
from collections.abc import Callable, Sequence
from typing import TypeVar

T = TypeVar("T")

_MAX_WORKERS = int(os.environ.get("SPARK_GRAFT_OVERLAP_WORKERS", "4"))


def run_overlapped(thunks: Sequence[Callable[[], T]]) -> list[T]:
    """Run independent build-and-materialize thunks concurrently and
    return their results in input order.

    Each thunk typically builds a DataFrame and eagerly
    ``localCheckpoint``s it; running them from a thread pool overlaps
    their jobs (guide §2.6) while downstream consumers still read each
    materialized RDD exactly once (guide §2.4). Thunks MUST be
    independent — a thunk that consumes another thunk's result belongs
    in a later call. Exceptions propagate to the caller unchanged.
    """
    if len(thunks) <= 1:
        return [t() for t in thunks]
    from concurrent.futures import ThreadPoolExecutor

    workers = max(1, min(len(thunks), _MAX_WORKERS))
    with ThreadPoolExecutor(max_workers=workers) as pool:
        futures = [pool.submit(t) for t in thunks]
        return [f.result() for f in futures]

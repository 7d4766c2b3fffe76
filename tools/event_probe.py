#!/usr/bin/env python
"""100x stress probe for the event-analytics family (r11, VERDICT r10
item 7) — the sequence/funnel/CUSUM/bitmap/path queries registered in
round 10, measured at 100x events the way the pair/media families were.

Scaling model: an event log grows by USERS, not by events-per-user, so
each of the K replicas offsets BOTH event_id and user_id by the base
span — per-user group sizes stay constant (the boundedness argument all
six plans make: user-partitioned windows / |types|^2-per-user pair
joins / calendar-bounded folds) while total rows grow Kx. A probe that
fattened users instead would test a different (and for these plans
wrong) asymptotic.

Timestamps are kept verbatim: the calendar span stays constant, so
q_event_rate_cusum's fold length (distinct hours) is constant by
construction while its per-hour counts grow Kx — exactly its documented
scale story.

Appends a section to docs/SCALING.md and prints one JSON line.

Usage: [EVENT_PROBE_K=100] python tools/event_probe.py
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

BASE = "/root/testdata/sf0.1"
K = int(os.environ.get("EVENT_PROBE_K", "100"))

EVENT_QUERIES = [
    "q_clickhouse_sequence_count",
    "q_window_funnel_strict",
    "q_funnel_latency_histogram",
    "q_event_rate_cusum",
    "q_bitmap_segment_census",
    "q_event_path_topk",
]


def synthesize_events(spark, out_dir: str) -> None:
    from pyspark.sql import functions as F

    df = spark.read.parquet(f"{BASE}/events.parquet")
    row = df.agg(
        F.max("event_id").alias("e"), F.max("user_id").alias("u")
    ).collect()[0]
    e_span, u_span = row.e + 1, row.u + 1
    parts = []
    for i in range(K):
        parts.append(
            df.withColumn(
                "event_id", (F.col("event_id") + i * e_span).cast("long")
            ).withColumn(
                "user_id", (F.col("user_id") + i * u_span).cast("long")
            )
        )
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    out.write.mode("overwrite").parquet(f"{out_dir}/events.parquet")


def time_queries(spark, sf_dir: str) -> dict[str, tuple[float, int]]:
    from arango_clickhouse_replica_spark.queries import QUERIES

    out = {}
    for name in EVENT_QUERIES:
        df = QUERIES[name].build(spark, sf_dir)
        df.write.format("noop").mode("overwrite").save()  # warm
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            QUERIES[name].build(spark, sf_dir).write.format("noop").mode(
                "overwrite"
            ).save()
            best = min(best, time.perf_counter() - t0)
        n_out = QUERIES[name].build(spark, sf_dir).count()
        out[name] = (round(best, 2), n_out)
    return out


def main() -> None:
    from arango_clickhouse_replica_spark.session import get_spark

    spark = get_spark("event-probe")
    spark.sparkContext.setLogLevel("ERROR")

    big_dir = tempfile.mkdtemp(prefix="event_probe_")
    try:
        print(f"synthesizing {K}x sf0.1 events into {big_dir} ...",
              file=sys.stderr)
        synthesize_events(spark, big_dir)
        base = time_queries(spark, BASE)
        big = time_queries(spark, big_dir)
    finally:
        shutil.rmtree(big_dir, ignore_errors=True)

    lines = [
        "",
        f"## Event-analytics family at {K}x (round 11)",
        "",
        f"`tools/event_probe.py`, {K}x sf0.1 events "
        f"({100_000 * K // 1_000_000}M rows; replicas offset event_id AND "
        "user_id, so the user count grows "
        f"{K}x while per-user group sizes and the calendar span stay "
        "constant — the growth model these plans' boundedness arguments "
        "assume; min-of-3 warm runs). rows = output cardinality.",
        "",
        f"| query | sf0.1 s | rows | {K}x s | rows | time ratio | rows ratio |",
        "|---|---|---|---|---|---|---|",
    ]
    for name in EVENT_QUERIES:
        bt, bn = base[name]
        gt, gn = big[name]
        tr = gt / bt if bt else float("nan")
        rr = gn / bn if bn else float("nan")
        lines.append(
            f"| {name} | {bt} | {bn:,} | {gt} | {gn:,} "
            f"| {tr:.1f}x | {rr:.1f}x |"
        )
    with open("docs/SCALING.md", "a") as f:
        f.write("\n".join(lines) + "\n")
    print(json.dumps({"K": K,
                      "base": {n: v[0] for n, v in base.items()},
                      "big": {n: v[0] for n, v in big.items()},
                      "rows_big": {n: v[1] for n, v in big.items()}}))


if __name__ == "__main__":
    main()

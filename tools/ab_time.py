#!/usr/bin/env python
"""Isolated per-query timing for optimization A/B loops (r14 opt round).

Times each named query exactly like bench.py does (full build + noop-sink
write per run, one warmup + 3 timed runs, min of the last two) on
local[$SPARK_GRAFT_CPUS], prints one line per query and a JSON dict at the
end. Unlike bench.py it times ONLY the named queries, so an A/B iteration
on a handful of suspects costs minutes, not a full suite run.

Usage: python tools/ab_time.py name1,name2,... [--label tag] [--runs 3]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = os.environ.get("SPARK_GRAFT_CPUS", "32")


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("names")
    ap.add_argument("--label", default="ab")
    ap.add_argument("--runs", type=int, default=3)
    args = ap.parse_args()
    names = [n for n in args.names.split(",") if n]

    from arango_clickhouse_replica_spark.queries import QUERIES
    from arango_clickhouse_replica_spark.session import get_spark

    spark = get_spark(f"ab-{args.label}")
    spark.sparkContext.setLogLevel("ERROR")

    out: dict[str, float] = {}
    for name in names:
        spark.sparkContext.setJobDescription(f"{args.label}: {name}")
        QUERIES[name].build(spark, SF_DIR).write.format("noop").mode(
            "overwrite"
        ).save()  # warmup
        best = float("inf")
        last = []
        for _ in range(args.runs):
            t0 = time.perf_counter()
            QUERIES[name].build(spark, SF_DIR).write.format("noop").mode(
                "overwrite"
            ).save()
            last.append(time.perf_counter() - t0)
        best = min(last[-2:]) if len(last) >= 2 else last[-1]
        out[name] = round(best, 3)
        print(f"AB {args.label} {name}: {best:.2f}s  (runs: "
              + ", ".join(f"{t:.2f}" for t in last) + ")", flush=True)
    print(json.dumps({"label": args.label, "sf": SF_DIR, "timings": out}))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())

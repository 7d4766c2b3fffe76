#!/usr/bin/env python
"""Driver-shape verification lane (VERDICT r1 item 6).

Mimics the round driver exactly: imports ``__spark_entry__`` by file path,
builds the driver's session (local[8], shuffle.partitions=8, UTC, Arrow
OFF), smoke-runs ``entry()``, then drives every ``queries()`` entry against
its ``oracle_sql()`` DuckDB oracle with the same order-insensitive
canonical compare the repo's parity suite uses. Queries without an oracle
get a rows-only ``count()``.

Usage:
    python tools/driver_check.py [--sf /root/testdata/sf0.01] \
        [--only name1,name2] [--limit N]

Exits non-zero on any failure; prints one status line per query.
"""

from __future__ import annotations

import argparse
import importlib.util
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))
sys.path.insert(0, str(REPO / "tests"))

TABLE_NAMES = (
    "region nation customer supplier part orders lineitem events "
    "documents embeddings"
).split()


def driver_session():
    from pyspark.sql import SparkSession

    return (
        SparkSession.builder.master("local[8]")
        .appName("driver-check")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", "8g")
        .getOrCreate()
    )


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default="/root/testdata/sf0.01")
    ap.add_argument("--only", default="", help="comma-separated query names")
    ap.add_argument("--limit", type=int, default=0,
                    help="check only the first N queries() entries (driver window)")
    ap.add_argument("--all", action="store_true",
                    help="drive the FULL registry (rotation-exempt included), "
                         "bypassing the 150-name emission cap — the per-round "
                         "full-verification record (VERDICT r6 item 1)")
    ap.add_argument("--json", default="",
                    help="write per-query results to this JSON file")
    args = ap.parse_args()

    import duckdb

    from oracle_util import compare

    spec = importlib.util.spec_from_file_location(
        "__spark_entry__", str(REPO / "__spark_entry__.py")
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)

    spark = driver_session()
    spark.sparkContext.setLogLevel("ERROR")

    rows = mod.entry(spark).collect()
    print(f"smoke entry(): {len(rows)} rows")
    assert len(rows) > 0, "entry() returned no rows"

    duck = duckdb.connect()
    for t in TABLE_NAMES:
        duck.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{args.sf}/{t}.parquet')"
        )

    if args.all:
        from arango_clickhouse_replica_spark.queries import QUERIES

        qs = {n: q.build for n, q in QUERIES.items()}
        oracles = {n: q.oracle for n, q in QUERIES.items()
                   if q.oracle is not None}
    else:
        qs = mod.queries()
        oracles = mod.oracle_sql()
    names = list(qs)
    if args.only:
        wanted = args.only.split(",")
        names = [n for n in names if n in wanted]
    if args.limit:
        names = names[: args.limit]

    failures = []
    record: dict[str, dict] = {}
    for name in names:
        t0 = time.perf_counter()
        try:
            df = qs[name](spark, args.sf)
            if name in oracles:
                ok, msg = compare(df, duck.sql(oracles[name]))
            else:
                n = df.count()
                ok, msg = n >= 0, f"rows-only: {n} rows"
        except Exception as exc:  # noqa: BLE001 — report and continue, like the driver
            ok, msg = False, f"err: {type(exc).__name__}: {exc}"
        dt = time.perf_counter() - t0
        status = "PASS" if ok else "FAIL"
        print(f"{status} {name} ({dt:.1f}s) {msg if not ok or 'rows-only' in msg else ''}")
        record[name] = {
            "pass": ok,
            "oracle": name in oracles,
            "sec": round(dt, 2),
            **({} if ok else {"msg": msg[:300]}),
        }
        if not ok:
            failures.append((name, msg))

    print(f"\n{len(names) - len(failures)}/{len(names)} pass")
    for name, msg in failures:
        print(f"  FAIL {name}: {msg[:500]}")
    if args.json:
        import json as _json
        import re as _re

        # r11 (VERDICT r10 item 6): surface rotation staleness as data —
        # per query, the age in rounds of its newest driver-green row
        # (relative to the newest CORRECTNESS_r*.json present; null =
        # never driver-verified, i.e. registered this round). The
        # rotation budget (150 = 3 x 50-slot window) guarantees <= 3
        # for every emitted name; tests/test_entry_contract.py asserts
        # it stays that way as the registry grows.
        seen = mod._previously_verified()
        rounds = [int(m.group(1)) for p in REPO.glob("CORRECTNESS_r*.json")
                  if (m := _re.search(r"CORRECTNESS_r(\d+)\.json", p.name))]
        latest = max(rounds, default=0)
        emitted = list(mod.queries())
        staleness = {
            n: (None if n not in seen else latest - seen[n]) for n in emitted
        }
        ages = [a for a in staleness.values() if a is not None]
        # The emission HEAD (EXEMPT_SAMPLE_SLOTS names) is what the
        # driver's next correctness window verifies first — so the
        # stalest names being scheduled there means their age resets in
        # the NEXT CORRECTNESS_r*.json. staleness_max_emitted therefore
        # lags the mechanism by one driver cycle: record the scheduled
        # head so the lag is visible as data, not a mystery.
        head = emitted[:getattr(mod, "EXEMPT_SAMPLE_SLOTS", 5)]
        Path(args.json).write_text(_json.dumps(
            {"sf": args.sf, "full_registry": bool(args.all),
             "n": len(names),
             "n_pass": len(names) - len(failures),
             "staleness_vs_round": latest,
             "staleness_max_emitted": max(ages, default=None),
             "scheduled_for_driver_refresh": {
                 n: staleness.get(n) for n in head
             },
             "green_age_rounds": staleness,
             "queries": record},
            indent=1, sort_keys=True) + "\n")
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())

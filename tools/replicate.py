#!/usr/bin/env python
"""Replication orchestrator CLI — the reference's ``replicate.py`` entry
point (§3.1, replicate.py:26-32 + replication/replicator/sync.py:75-160)
reduced to its Spark shape: per-table streaming pipelines with optional
full resync, driven by YAML table mappings.

    python tools/replicate.py --tables events,documents \\
        --envelope-root /data/envelopes --state-root /data/state \\
        [--mappings tables/] [--resync] [--drain]

Per table this either starts a supervised continuous stream or (with
--drain) processes the backlog with Trigger.AvailableNow and exits —
the snapshot/cutover dance collapses into: wipe state, batch-load, let
the checkpointed stream take over (overlap absorbed by version dedup).
No Redis, no PM2, no Kafka admin: the checkpoint directory is the only
progress state.
"""

from __future__ import annotations

import argparse
import os
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main() -> None:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--tables", required=True,
                    help="comma-separated table names (envelope dirs under envelope-root)")
    ap.add_argument("--envelope-root", required=True)
    ap.add_argument("--state-root", required=True,
                    help="per-table target/checkpoint/dead-letter dirs live here")
    ap.add_argument("--mappings", default=None,
                    help="directory of per-table YAML mappings (tables/*.yaml shape)")
    ap.add_argument("--keys", default="_key",
                    help="comma-separated primary-key columns (default: _key)")
    ap.add_argument("--resync", action="store_true",
                    help="wipe checkpoint+target and rebuild from the full envelope log")
    ap.add_argument("--drain", action="store_true",
                    help="process available envelopes then exit (Trigger.AvailableNow)")
    ap.add_argument("--ddl", action="store_true",
                    help="print the generated ClickHouse target DDL per mapped "
                         "table (schema/ddl.py) and exit — for bootstrapping a "
                         "fresh JDBC target")
    ap.add_argument("--merge-on-write", action="store_true",
                    help="use the bucketed merge-on-write sink instead of the "
                         "append-only + merge-on-read target")
    args = ap.parse_args()

    from arango_clickhouse_replica_spark.schema.dsl import TableMapping
    from arango_clickhouse_replica_spark.session import get_spark
    from arango_clickhouse_replica_spark.streaming import CdcPipeline
    from arango_clickhouse_replica_spark.streaming.manager import (
        ReplicationManager,
        TableRunner,
    )
    from arango_clickhouse_replica_spark.streaming.merge_sink import BucketedMergeSink
    from arango_clickhouse_replica_spark.streaming.monitor import TickGapMonitor

    if args.ddl:
        from arango_clickhouse_replica_spark.schema.ddl import create_table_ddl

        if not args.mappings:
            raise SystemExit("--ddl requires --mappings")
        for name in args.tables.split(","):
            yml = os.path.join(args.mappings, f"{name}.yaml")
            if not os.path.exists(yml):
                raise SystemExit(f"no mapping for table {name!r}: {yml}")
            print(create_table_ddl(TableMapping.from_yaml_file(yml)))
        return

    spark = get_spark("replicate")
    mgr = ReplicationManager(spark)
    keys = args.keys.split(",")

    for name in args.tables.split(","):
        env_dir = os.path.join(args.envelope_root, name)
        if not os.path.isdir(env_dir):
            raise SystemExit(f"no envelope dir for table {name!r}: {env_dir}")
        mapping = None
        if args.mappings:
            yml = os.path.join(args.mappings, f"{name}.yaml")
            if os.path.exists(yml):
                mapping = TableMapping.from_yaml_file(yml)
        state = os.path.join(args.state_root, name)
        target_dir = os.path.join(state, "target")
        sink = (
            BucketedMergeSink(spark, target_dir, keys)
            if args.merge_on_write
            else None
        )
        monitor = TickGapMonitor(
            on_gap=lambda g, t=name: print(
                f"{t}: TICKS LOST asked for {g.expected_from} "
                f"but got {g.observed_from} ({g.missing} missing)",
                file=sys.stderr,
            )
        )
        pipe = CdcPipeline(
            spark,
            target_dir=target_dir,
            checkpoint_dir=os.path.join(state, "ckpt"),
            keys=keys,
            mapping=mapping,
            dead_letter_dir=os.path.join(state, "dead"),
            tick_monitor=monitor,
            merge_sink=sink,
        )
        schema = spark.read.parquet(env_dir).schema
        if args.resync:
            import shutil

            for d in (pipe.checkpoint_dir, pipe.target_dir):
                shutil.rmtree(d, ignore_errors=True)
        if args.drain:
            pipe.run_until_drained(env_dir, schema)
            print(f"{name}: drained; latest-state rows = {pipe.latest_alive().count()}")
        else:
            mgr.add(TableRunner(name, pipe, env_dir, schema))

    if not args.drain:
        mgr.start_all()
        print("streams running:", [s["table"] for s in mgr.statuses()])
        try:
            for r in mgr.runners.values():
                r.query.awaitTermination()
        except KeyboardInterrupt:
            mgr.stop_all()


if __name__ == "__main__":
    main()

#!/usr/bin/env python
"""Scale probe for the sharded WAL forwarder (VERDICT r6 item 6).

``forward_to_jsonl_sharded`` is the one-topic-per-collection scale
escape as files: one serial WAL tail cursor, N per-collection envelope
directories downstream. This probe measures the forwarder's routing
throughput at a WAL volume far beyond the pytest fixtures (N collections
x M pages against a scripted in-memory replication API) and then
DEMONSTRATES the claim that justifies the sharding: a per-collection
Structured Streaming consumer lists and reads ONLY its own shard —
partition pruning at the source, so a slow table never stalls the
others and ingest parallelism is N, not 1.

Appends a section to docs/SCALING.md and prints one JSON line.
"""

from __future__ import annotations

import bisect
import json
import os
import shutil
import sys
import tempfile
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

N_COLLECTIONS = int(os.environ.get("WAL_PROBE_COLLECTIONS", "8"))
N_PAGES = int(os.environ.get("WAL_PROBE_PAGES", "400"))
PAGE_SIZE = int(os.environ.get("WAL_PROBE_PAGE_SIZE", "64"))


class BigScriptedWal:
    """In-memory replication API fake sized for probing: tail pages are
    served by bisect on the tick index (the pytest fixture's linear scan
    would make the SERVER the bottleneck at probe volume)."""

    def __init__(self, entries, page_size):
        self.entries = entries
        self.ticks = [int(e["tick"]) for e in entries]
        self.page_size = page_size

    def transport(self, url, headers):
        if "/_api/wal/lastTick" in url:
            return 200, {}, json.dumps(
                {"tick": self.entries[-1]["tick"],
                 "server": {"serverId": "1"}}).encode()
        from urllib.parse import parse_qs, urlparse

        lower = int(parse_qs(urlparse(url).query)["from"][0])
        i = bisect.bisect_right(self.ticks, lower)
        page = self.entries[i: i + self.page_size]
        if not page:
            return 204, {
                "x-arango-replication-lastincluded": "0",
                "x-arango-replication-checkmore": "false",
            }, b""
        return 200, {
            "x-arango-replication-lastincluded": page[-1]["tick"],
            "x-arango-replication-checkmore":
                "true" if i + len(page) < len(self.entries) else "false",
        }, "\n".join(json.dumps(e) for e in page).encode()


def main() -> None:
    from arango_clickhouse_replica_spark.sources.arango_wal import (
        UPSERT_DOCUMENT,
        ArangoWalClient,
        ArangoWalConfig,
        FileTickStore,
        forward_to_jsonl_sharded,
    )

    colls = {f"coll{i:02d}": f"h{i:03d}/1" for i in range(N_COLLECTIONS)}
    cuids = list(colls.values())
    n_entries = N_PAGES * PAGE_SIZE
    entries = [
        {
            "tick": str(t + 1),
            "type": UPSERT_DOCUMENT,
            "db": "probedb",
            "cuid": cuids[t % N_COLLECTIONS],  # round-robin interleave
            "tid": "0",
            "data": {"_key": f"k{t + 1}", "v": t},
        }
        for t in range(n_entries)
    ]
    server = BigScriptedWal(entries, PAGE_SIZE)
    client = ArangoWalClient(
        ArangoWalConfig(db="probedb"), transport=server.transport
    )

    work = tempfile.mkdtemp(prefix="wal_shard_probe_")
    try:
        store = FileTickStore(os.path.join(work, "tick"))
        store.set(0)
        out = os.path.join(work, "sharded")
        t0 = time.perf_counter()
        written = forward_to_jsonl_sharded(client, store, colls, out)
        fwd_s = time.perf_counter() - t0

        files_per_coll = {c: len(os.listdir(os.path.join(out, c)))
                          for c in colls}
        docs_per_coll = n_entries // N_COLLECTIONS

        # --- consumer isolation: one shard's consumer sees ONLY its shard
        from arango_clickhouse_replica_spark.session import get_spark

        spark = get_spark("wal-shard-probe")
        spark.sparkContext.setLogLevel("ERROR")
        one = os.path.join(out, "coll00")
        batch = spark.read.json(one)
        listed = batch.inputFiles()
        assert all(f"/coll00/" in f for f in listed), "listed outside shard"
        assert len(listed) == files_per_coll["coll00"]
        assert batch.count() == docs_per_coll

        # and as a real streaming source with its own checkpoint
        stream = (
            spark.readStream.schema(batch.schema)
            .option("maxFilesPerTrigger", 100)
            .json(one)
        )
        seen = {"rows": 0, "batches": 0}

        def count_batch(df, _bid):
            seen["rows"] += df.count()
            seen["batches"] += 1

        q = (
            stream.writeStream.foreachBatch(count_batch)
            .option("checkpointLocation", os.path.join(work, "ckpt"))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        assert seen["rows"] == docs_per_coll, seen

        result = {
            "collections": N_COLLECTIONS,
            "pages": N_PAGES,
            "page_size": PAGE_SIZE,
            "entries": n_entries,
            "forward_s": round(fwd_s, 2),
            "docs_per_s": int(n_entries / fwd_s),
            "files_per_collection": files_per_coll["coll00"],
            "consumer_listed_files": len(listed),
            "consumer_rows": docs_per_coll,
            "stream_batches": seen["batches"],
        }
    finally:
        shutil.rmtree(work, ignore_errors=True)

    lines = [
        "",
        "## Sharded WAL forwarder probe (round 7 — r6 verdict item 6)",
        "",
        f"{N_COLLECTIONS} collections round-robin-interleaved in one WAL, "
        f"{N_PAGES} pages x {PAGE_SIZE} docs/page = {n_entries:,} documents "
        "against a scripted in-memory replication API "
        "(tools/wal_shard_probe.py):",
        "",
        f"- forward_to_jsonl_sharded routed all pages in "
        f"**{result['forward_s']} s ({result['docs_per_s']:,} docs/s)** — "
        "the serial segment is page fetch + in-memory group-by, no "
        "per-document parsing beyond json round-trip;",
        f"- every collection dir holds {result['files_per_collection']} "
        "tick-named files (one per page that contained its docs);",
        "- **consumer isolation demonstrated**: a consumer on one shard "
        f"listed exactly its own {result['consumer_listed_files']} files "
        "(`inputFiles()` all under its dir — pruning at the source "
        "listing, not a post-filter) and a real Structured Streaming "
        f"drive with its own checkpoint read {result['consumer_rows']:,} "
        f"rows in {result['stream_batches']} micro-batches without "
        "touching the other shards. N slow-independent consumers ingest "
        "N collections in parallel; beyond one WAL's bandwidth the next "
        "sharding unit is the database (one forwarder per db WAL).",
    ]
    with open("docs/SCALING.md", "a") as f:
        f.write("\n".join(lines) + "\n")
    print(json.dumps(result))


if __name__ == "__main__":
    main()

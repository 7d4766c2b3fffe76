"""Scripted-WAL transport factory for the arango_wal DataSource tests.

Spark runs Python data source readers in a separate worker process, so
the scripted server state must cross process boundaries: it lives in a
JSON file (path passed via the ``walFile`` option) that the transport
re-reads per request — tests grow the WAL mid-stream by rewriting it."""

from __future__ import annotations

import json
from urllib.parse import parse_qs, urlparse


def write_wal(path: str, entries, page_size: int = 2) -> None:
    with open(path, "w") as f:
        json.dump({"entries": list(entries), "page_size": page_size}, f)


def append_entries(path: str, entries) -> None:
    with open(path) as f:
        state = json.load(f)
    state["entries"].extend(entries)
    with open(path, "w") as f:
        json.dump(state, f)


def make_stuck_transport(options):
    """A misbehaving server: every tail page claims check_more=true but
    re-serves the SAME last_included as the requested cursor (no forward
    progress) — replay must terminate, not spin (ADVICE r4)."""

    def transport(url, headers):
        if "/_api/wal/lastTick" in url:
            return 200, {}, json.dumps(
                {"tick": "100", "server": {"serverId": "1"}}).encode()
        q = parse_qs(urlparse(url).query)
        lower = q["from"][0]
        return 200, {
            "x-arango-replication-lastincluded": lower,
            "x-arango-replication-checkmore": "true",
        }, b""

    return transport


def make_transport(options):
    path = options["walfile"]

    def transport(url, headers):
        assert headers.get("Authorization", "").startswith("Basic ")
        with open(path) as f:
            state = json.load(f)
        entries, page_size = state["entries"], state["page_size"]
        if "/_api/wal/lastTick" in url:
            last = entries[-1]["tick"] if entries else "0"
            body = json.dumps({"tick": last, "server": {"serverId": "1"}})
            return 200, {}, body.encode()
        assert "/_api/wal/tail" in url
        q = parse_qs(urlparse(url).query)
        lower = int(q["from"][0])
        pending = [e for e in entries if int(e["tick"]) > lower]
        page = pending[:page_size]
        if not page:
            return 204, {
                "x-arango-replication-lastincluded": "0",
                "x-arango-replication-checkmore": "false",
            }, b""
        body = "\n".join(json.dumps(e) for e in page).encode()
        return 200, {
            "x-arango-replication-lastincluded": page[-1]["tick"],
            "x-arango-replication-checkmore":
                "true" if len(pending) > len(page) else "false",
        }, body

    return transport

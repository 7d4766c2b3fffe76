#!/usr/bin/env python
"""Process supervision CLI — the engine's equivalent of the reference's
PM2 deployment (C5: reference/ecosystem.yaml:3-17 declares per-app
``max_restarts`` / ``min_uptime`` / ``restart_delay`` / ``kill_timeout``;
reference/replication/replicator/pm2.py:29-50 wraps the pm2 binary).
On a Spark cluster the cluster manager owns executor supervision, but
the DRIVER-side long-runners (tools/replicate.py, tools/ingest.py) still
need an OS-level restart policy on bare deployments — this supervisor
provides exactly the reference's semantics without the pm2 dependency:

    python tools/supervise.py --status-file run/status.json \\
        --max-restarts 3 --min-uptime 20 --restart-delay 0.5 \\
        --kill-timeout 10 -- python tools/replicate.py ...

or driven by an ecosystem-shaped YAML app block:

    python tools/supervise.py --config ecosystem.yaml --app producer \\
        --status-file run/status.json -- python tools/replicate.py ...

Semantics (mirroring PM2's):
- exit 0 -> supervised command finished; supervisor exits 0.
- nonzero exit -> restart after ``restart_delay`` (doubling per
  CONSECUTIVE crash, capped at 16x), up to ``max_restarts`` times.
- a run that survives ``min_uptime`` seconds resets the restart
  counter (a long-lived process that finally crashes gets a fresh
  budget — PM2's min_uptime contract).
- SIGTERM/SIGINT -> forward SIGTERM to the child, wait
  ``kill_timeout`` seconds, SIGKILL if still alive; exit 0 ("stopped").
- ``max_memory_restart`` (e.g. '512M', the key both reference apps
  set) -> the wait loop polls the child's RSS (/proc/<pid>/status
  VmRSS, ~1 Hz); crossing the bound terminates the child (SIGTERM ->
  kill_timeout -> SIGKILL) and takes the normal crash/restart path,
  PM2's memory-based restart policy.
- every transition is written to ``--status-file`` as one JSON object
  (state, pid, restarts, last_exit, updated_at) — the liveness surface
  the reference reads back from ``pm2 jlist``.
"""

from __future__ import annotations

import argparse
import json
import signal
import subprocess
import sys
import time
from pathlib import Path


def _write_status(path: str | None, **kv) -> None:
    if not path:
        return
    kv["updated_at"] = time.time()
    p = Path(path)
    p.parent.mkdir(parents=True, exist_ok=True)
    tmp = p.with_suffix(p.suffix + ".tmp")
    tmp.write_text(json.dumps(kv, indent=1, sort_keys=True) + "\n")
    tmp.replace(p)


def _load_app_config(config_path: str, app: str) -> dict:
    """Read an ecosystem-shaped YAML app block (the reference's config
    format). Only the supervision keys are consumed; units follow the
    reference (restart_delay/kill_timeout in ms, min_uptime like
    '20m')."""
    import yaml

    apps = yaml.safe_load(Path(config_path).read_text())["apps"]
    block = next((a for a in apps if a.get("name") == app), None)
    if block is None:
        raise SystemExit(f"app {app!r} not found in {config_path}")

    def _duration_s(v) -> float:
        """PM2 duration: bare numbers are MILLISECONDS; 'ms'/'s'/'m'/'h'
        suffixes as labeled."""
        v = str(v)
        if v.endswith("ms"):
            return float(v[:-2]) / 1000.0
        mult = {"s": 1, "m": 60, "h": 3600}.get(v[-1])
        if mult is not None:
            return float(v[:-1]) * mult
        return float(v) / 1000.0

    out = {}
    if block.get("autorestart") is False:
        out["max_restarts"] = 0
    if "max_restarts" in block:
        out["max_restarts"] = int(block["max_restarts"])
    if "restart_delay" in block:
        out["restart_delay"] = float(block["restart_delay"]) / 1000.0
    if "kill_timeout" in block:
        out["kill_timeout"] = float(block["kill_timeout"]) / 1000.0
    if "min_uptime" in block:
        out["min_uptime"] = _duration_s(block["min_uptime"])
    if "max_memory_restart" in block:
        out["max_memory_bytes"] = _mem_bytes(block["max_memory_restart"])
    return out


def _mem_bytes(v) -> int:
    """PM2 memory spec: bare numbers are BYTES; K/M/G suffixes as
    labeled (binary units, matching pm2's parser)."""
    v = str(v).strip()
    mult = {"K": 1024, "M": 1024 ** 2, "G": 1024 ** 3}.get(v[-1:].upper())
    if mult is not None:
        return int(float(v[:-1]) * mult)
    return int(float(v))


def _rss_bytes(pid: int) -> int | None:
    """Resident set size of ``pid`` via /proc (Linux); None if gone or
    unreadable — a vanished child is the wait loop's problem, not ours."""
    try:
        with open(f"/proc/{pid}/status") as f:
            for line in f:
                if line.startswith("VmRSS:"):
                    return int(line.split()[1]) * 1024
    except (OSError, ValueError, IndexError):
        return None
    return None


def supervise(cmd: list[str], *, max_restarts: int = 3,
              min_uptime: float = 20.0, restart_delay: float = 0.5,
              kill_timeout: float = 10.0,
              max_memory_bytes: int | None = None,
              status_file: str | None = None) -> int:
    """Run ``cmd`` under the restart policy; return the exit code the
    supervisor should propagate."""
    restarts = 0
    stopping = {"flag": False}
    child: dict = {"proc": None}

    def _terminate(signum, frame):
        stopping["flag"] = True
        proc = child["proc"]
        if proc is not None and proc.poll() is None:
            proc.terminate()

    old_term = signal.signal(signal.SIGTERM, _terminate)
    old_int = signal.signal(signal.SIGINT, _terminate)
    try:
        while True:
            started = time.monotonic()
            try:
                proc = subprocess.Popen(cmd)
            except OSError as e:
                _write_status(status_file, state="failed", pid=None,
                              restarts=restarts,
                              last_exit=f"spawn error: {e}")
                return 1
            child["proc"] = proc
            if stopping["flag"] and proc.poll() is None:
                # signal landed in the Popen registration race window;
                # _terminate saw no child, so deliver the SIGTERM here
                proc.terminate()
            _write_status(status_file, state="running", pid=proc.pid,
                          restarts=restarts, last_exit=None)
            mem_kill = False
            next_mem_check = time.monotonic()
            while True:
                try:
                    rc = proc.wait(timeout=0.2)
                    break
                except subprocess.TimeoutExpired:
                    if stopping["flag"]:
                        if proc.poll() is None:
                            proc.terminate()
                        try:
                            rc = proc.wait(timeout=kill_timeout)
                        except subprocess.TimeoutExpired:
                            proc.kill()
                            rc = proc.wait()
                        break
                    if (max_memory_bytes is not None
                            and time.monotonic() >= next_mem_check):
                        next_mem_check = time.monotonic() + 1.0
                        rss = _rss_bytes(proc.pid)
                        if rss is not None and rss > max_memory_bytes:
                            mem_kill = True
                            proc.terminate()
                            try:
                                rc = proc.wait(timeout=kill_timeout)
                            except subprocess.TimeoutExpired:
                                proc.kill()
                                rc = proc.wait()
                            break
            uptime = time.monotonic() - started
            if mem_kill and rc == 0:
                # the child caught SIGTERM and exited cleanly; the
                # restart is still owed — a 0 exit must not read as
                # "finished" when WE killed it for memory
                rc = 1
            if stopping["flag"]:
                _write_status(status_file, state="stopped", pid=None,
                              restarts=restarts, last_exit=rc)
                return 0
            if rc == 0:
                _write_status(status_file, state="finished", pid=None,
                              restarts=restarts, last_exit=0)
                return 0
            reason = "max_memory_restart" if mem_kill else None
            if uptime >= min_uptime:
                restarts = 0  # long-lived: fresh restart budget
            if restarts >= max_restarts:
                _write_status(status_file, state="failed", pid=None,
                              restarts=restarts, last_exit=rc,
                              reason=reason)
                return 1
            delay = restart_delay * min(16, 2 ** restarts)
            restarts += 1
            _write_status(status_file, state="backoff", pid=None,
                          restarts=restarts, last_exit=rc, reason=reason)
            deadline = time.monotonic() + delay
            while time.monotonic() < deadline and not stopping["flag"]:
                time.sleep(0.05)
            if stopping["flag"]:
                _write_status(status_file, state="stopped", pid=None,
                              restarts=restarts, last_exit=rc)
                return 0
    finally:
        signal.signal(signal.SIGTERM, old_term)
        signal.signal(signal.SIGINT, old_int)


def main() -> None:
    ap = argparse.ArgumentParser(
        description=__doc__,
        formatter_class=argparse.RawDescriptionHelpFormatter,
    )
    ap.add_argument("--status-file", default=None)
    # defaults resolve AFTER --config so explicit CLI flags win over the
    # YAML, and the YAML wins over built-ins
    ap.add_argument("--max-restarts", type=int, default=None)
    ap.add_argument("--min-uptime", type=float, default=None,
                    help="seconds a run must survive to reset the "
                         "restart budget (default 20)")
    ap.add_argument("--restart-delay", type=float, default=None,
                    help="base backoff seconds, doubling per consecutive "
                         "crash, capped at 16x (default 0.5)")
    ap.add_argument("--kill-timeout", type=float, default=None,
                    help="SIGTERM grace before SIGKILL (default 10)")
    ap.add_argument("--max-memory-restart", default=None,
                    help="restart the child when its RSS exceeds this "
                         "(PM2 spec: bytes, or K/M/G suffix, e.g. 512M)")
    ap.add_argument("--config", default=None,
                    help="ecosystem-shaped YAML to read supervision "
                         "keys from")
    ap.add_argument("--app", default=None,
                    help="app name inside --config")
    ap.add_argument("cmd", nargs=argparse.REMAINDER,
                    help="-- command to supervise")
    args = ap.parse_args()
    cmd = args.cmd[1:] if args.cmd[:1] == ["--"] else args.cmd
    if not cmd:
        ap.error("no command given (pass it after --)")
    policy = dict(max_restarts=3, min_uptime=20.0,
                  restart_delay=0.5, kill_timeout=10.0)
    if args.config:
        if not args.app:
            ap.error("--config requires --app")
        policy.update(_load_app_config(args.config, args.app))
    cli = dict(max_restarts=args.max_restarts,
               min_uptime=args.min_uptime,
               restart_delay=args.restart_delay,
               kill_timeout=args.kill_timeout,
               max_memory_bytes=(
                   _mem_bytes(args.max_memory_restart)
                   if args.max_memory_restart is not None else None))
    policy.update({k: v for k, v in cli.items() if v is not None})
    sys.exit(supervise(cmd, status_file=args.status_file, **policy))


if __name__ == "__main__":
    main()

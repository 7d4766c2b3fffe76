"""tools/supervise.py — the C5 process-supervision semantics
(reference/ecosystem.yaml:3-17, reference/replication/replicator/
pm2.py:29-50): crash-restart with backoff, max-restart failure,
min-uptime budget reset, signal-forwarded graceful stop, status file."""

import json
import os
import signal
import subprocess
import sys
import textwrap
import time
from pathlib import Path

import pytest

TOOLS = Path(__file__).resolve().parent.parent / "tools"


def _load(path):
    import importlib.util

    spec = importlib.util.spec_from_file_location("supervise_tool", str(path))
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


sup = _load(TOOLS / "supervise.py")


def _crashing_child(tmp_path, crashes: int) -> list:
    """A child that exits 1 for its first `crashes` runs, then 0."""
    counter = tmp_path / "count.txt"
    script = tmp_path / "child.py"
    script.write_text(textwrap.dedent(f"""
        from pathlib import Path
        p = Path({str(counter)!r})
        n = int(p.read_text()) if p.exists() else 0
        p.write_text(str(n + 1))
        raise SystemExit(1 if n < {crashes} else 0)
    """))
    return [sys.executable, str(script)]


def test_restarts_then_succeeds(tmp_path):
    status = tmp_path / "status.json"
    rc = sup.supervise(
        _crashing_child(tmp_path, 2),
        max_restarts=5, min_uptime=100.0, restart_delay=0.05,
        kill_timeout=2.0, status_file=str(status),
    )
    assert rc == 0
    st = json.loads(status.read_text())
    assert st["state"] == "finished"
    assert st["restarts"] == 2
    assert st["last_exit"] == 0


def test_max_restarts_exceeded_fails(tmp_path):
    status = tmp_path / "status.json"
    rc = sup.supervise(
        _crashing_child(tmp_path, 99),
        max_restarts=2, min_uptime=100.0, restart_delay=0.05,
        kill_timeout=2.0, status_file=str(status),
    )
    assert rc == 1
    st = json.loads(status.read_text())
    assert st["state"] == "failed"
    assert st["restarts"] == 2
    assert st["last_exit"] == 1


def test_min_uptime_resets_budget(tmp_path):
    """A run longer than min_uptime resets the counter: with
    max_restarts=1 and every run surviving min_uptime before crashing,
    the supervisor keeps restarting (we stop it via the child
    eventually succeeding)."""
    counter = tmp_path / "count.txt"
    script = tmp_path / "child.py"
    script.write_text(textwrap.dedent(f"""
        import time
        from pathlib import Path
        p = Path({str(counter)!r})
        n = int(p.read_text()) if p.exists() else 0
        p.write_text(str(n + 1))
        time.sleep(0.3)   # survive min_uptime=0.2 -> budget resets
        raise SystemExit(1 if n < 3 else 0)
    """))
    rc = sup.supervise(
        [sys.executable, str(script)],
        max_restarts=1, min_uptime=0.2, restart_delay=0.05,
        kill_timeout=2.0, status_file=None,
    )
    assert rc == 0
    assert int(counter.read_text()) == 4  # 3 crashes + final success


def test_sigterm_forwards_and_stops(tmp_path):
    status = tmp_path / "status.json"
    child = tmp_path / "child.py"
    child.write_text("import time\ntime.sleep(60)\n")
    proc = subprocess.Popen(
        [sys.executable, str(TOOLS / "supervise.py"),
         "--status-file", str(status), "--kill-timeout", "5",
         "--", sys.executable, str(child)],
    )
    deadline = time.monotonic() + 15
    while time.monotonic() < deadline:
        if status.exists() and json.loads(
                status.read_text()).get("state") == "running":
            break
        time.sleep(0.1)
    else:
        proc.kill()
        pytest.fail("supervisor never reported running")
    child_pid = json.loads(status.read_text())["pid"]
    os.kill(proc.pid, signal.SIGTERM)
    assert proc.wait(timeout=20) == 0
    st = json.loads(status.read_text())
    assert st["state"] == "stopped"
    with pytest.raises(ProcessLookupError):
        os.kill(child_pid, 0)


def test_ecosystem_yaml_units(tmp_path):
    """The --config path consumes the reference's ecosystem.yaml keys
    with the reference's units (ms delays, '20m' uptime)."""
    cfg = tmp_path / "eco.yaml"
    cfg.write_text(textwrap.dedent("""
        apps:
          - name: producer
            max_restarts: 7
            min_uptime: 20m
            restart_delay: 300000
            kill_timeout: 90000
    """))
    policy = sup._load_app_config(str(cfg), "producer")
    assert policy == {
        "max_restarts": 7,
        "min_uptime": 1200.0,
        "restart_delay": 300.0,
        "kill_timeout": 90.0,
    }
    with pytest.raises(SystemExit):
        sup._load_app_config(str(cfg), "nope")


def test_ecosystem_yaml_pm2_edge_semantics(tmp_path):
    """PM2 edge semantics: bare min_uptime numbers are MILLISECONDS,
    'ms' suffix parses, and autorestart: false means zero restarts."""
    cfg = tmp_path / "eco2.yaml"
    cfg.write_text(textwrap.dedent("""
        apps:
          - name: consumer
            autorestart: false
            min_uptime: 5000
          - name: flaky
            min_uptime: 100ms
    """))
    consumer = sup._load_app_config(str(cfg), "consumer")
    assert consumer["max_restarts"] == 0
    assert consumer["min_uptime"] == 5.0
    assert sup._load_app_config(str(cfg), "flaky")["min_uptime"] == 0.1


def test_spawn_failure_is_terminal(tmp_path):
    status = tmp_path / "status.json"
    rc = sup.supervise(
        ["/nonexistent/binary-xyz"],
        max_restarts=3, min_uptime=1.0, restart_delay=0.05,
        kill_timeout=1.0, status_file=str(status),
    )
    assert rc == 1
    st = json.loads(status.read_text())
    assert st["state"] == "failed"
    assert "spawn error" in st["last_exit"]


def test_cli_flags_override_config(tmp_path):
    """Conventional precedence: CLI > YAML > built-ins."""
    cfg = tmp_path / "eco3.yaml"
    cfg.write_text(textwrap.dedent("""
        apps:
          - name: producer
            max_restarts: 3
    """))
    child = _crashing_child(tmp_path, 99)
    proc = subprocess.run(
        [sys.executable, str(TOOLS / "supervise.py"),
         "--config", str(cfg), "--app", "producer",
         "--max-restarts", "1", "--min-uptime", "100",
         "--restart-delay", "0.05",
         "--status-file", str(tmp_path / "s.json"),
         "--", *child],
        capture_output=True, timeout=60,
    )
    assert proc.returncode == 1
    st = json.loads((tmp_path / "s.json").read_text())
    assert st["restarts"] == 1  # CLI's 1, not the YAML's 3


def test_max_memory_restart_kills_and_restarts(tmp_path):
    """ADVICE r8: max_memory_restart (both reference ecosystem apps set
    512M) must be a real policy — a child whose RSS crosses the bound
    is terminated and the normal crash/restart path runs."""
    script = tmp_path / "hog.py"
    script.write_text(textwrap.dedent("""
        import time
        a = bytearray(120 * 1024 * 1024)  # ~120 MiB resident
        a[::4096] = b"x" * len(a[::4096])  # touch pages
        time.sleep(60)
    """))
    status = tmp_path / "status.json"
    t0 = time.monotonic()
    rc = sup.supervise(
        [sys.executable, str(script)],
        max_restarts=0, min_uptime=100.0, restart_delay=0.05,
        kill_timeout=2.0, max_memory_bytes=40 * 1024 * 1024,
        status_file=str(status),
    )
    assert rc == 1
    assert time.monotonic() - t0 < 30  # killed, not slept out
    st = json.loads(status.read_text())
    assert st["state"] == "failed"
    assert st["reason"] == "max_memory_restart"


def test_max_memory_restart_yaml_and_cli_parse():
    assert sup._mem_bytes("512M") == 512 * 1024 ** 2
    assert sup._mem_bytes("1G") == 1024 ** 3
    assert sup._mem_bytes("100K") == 100 * 1024
    assert sup._mem_bytes("4096") == 4096


def test_ecosystem_yaml_max_memory(tmp_path):
    cfg = tmp_path / "eco4.yaml"
    cfg.write_text(textwrap.dedent("""
        apps:
          - name: producer
            max_memory_restart: 512M
    """))
    policy = sup._load_app_config(str(cfg), "producer")
    assert policy == {"max_memory_bytes": 512 * 1024 ** 2}

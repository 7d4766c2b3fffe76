#!/usr/bin/env python
"""Per-family ISOLATED bench anchors (r11, VERDICT r10 item 5).

The r9->r10 drift triage proved the instrument: a query flagged slow
inside the 184-query suite re-timed at-or-below its anchor when run in a
FRESH JVM with only its family as neighbors — suite contention, not
code. This tool formalizes that procedure so the next triage is
mechanical instead of a hand-written loop:

- ``refresh`` runs every headline family (or ``--family F``) through
  ``SPARK_GRAFT_ONLY=<family> python bench.py`` in its own subprocess
  (fresh JVM, no cross-family neighbors, regression guard off) and
  records the per-query isolated timings to ``bench_family_anchors.json``
  at the repo root.
- ``check --family F`` re-runs one family the same way and prints the
  per-query ratio against the recorded anchor — the one-command
  contention-vs-real answer.

``bench.py``'s regression guard consults the same file: offenders that
survive the in-suite confirm re-run get ONE isolated subset run
(apples-to-apples against these anchors) before the round fails.

Usage:
    python tools/family_anchors.py refresh [--family text] [--sf DIR]
    python tools/family_anchors.py check --family text [--sf DIR]
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

ANCHORS_FILE = "bench_family_anchors.json"


def family_of(name: str) -> str:
    """Headline-query family by name prefix (q1/q3 fold into 'q')."""
    head = name.split("_", 1)[0]
    return "q" if head in ("q1", "q3") else head


def headline_families() -> dict[str, list[str]]:
    import bench

    fams: dict[str, list[str]] = {}
    for n in bench.HEADLINE:
        fams.setdefault(family_of(n), []).append(n)
    return fams


def run_isolated(names: list[str], sf_dir: str | None) -> dict[str, float]:
    """One fresh-JVM bench subprocess over exactly ``names``; returns the
    per-query timings parsed from the subset run's JSON line (subset runs
    print the FULL per-query dict and never touch BENCH_SELF.json)."""
    env = dict(os.environ,
               SPARK_GRAFT_ONLY=",".join(names),
               SPARK_GRAFT_NO_REGRESSION_CHECK="1")
    if sf_dir:
        env["SPARK_GRAFT_SF_DIR"] = sf_dir
    out = subprocess.run(
        [sys.executable, str(REPO / "bench.py")],
        env=env, capture_output=True, text=True, check=True,
    ).stdout
    for line in reversed(out.splitlines()):
        line = line.strip()
        if line.startswith("{"):
            data = json.loads(line)
            return {k: float(v) for k, v in data["queries"].items()}
    raise RuntimeError(f"no JSON line in bench output for {names[:3]}...")


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("mode", choices=("refresh", "check"))
    ap.add_argument("--family", default="",
                    help="restrict to one family (refresh) / required (check)")
    ap.add_argument("--sf", default="",
                    help="override SPARK_GRAFT_SF_DIR for the subset runs")
    args = ap.parse_args()

    fams = headline_families()
    path = REPO / ANCHORS_FILE
    book = {}
    if path.exists():
        book = json.loads(path.read_text())

    if args.mode == "check":
        if args.family not in fams:
            raise SystemExit(f"unknown family {args.family!r}; have "
                             f"{sorted(fams)}")
        anchors = book.get("families", {}).get(args.family, {})
        fresh = run_isolated(fams[args.family], args.sf or None)
        worst = 0.0
        for n in sorted(fresh):
            a = anchors.get(n)
            ratio = (fresh[n] / a) if a else float("nan")
            worst = max(worst, ratio if a else 0.0)
            flag = " <-- REAL?" if a and fresh[n] > 1.5 * a and fresh[n] - a > 1.0 else ""
            print(f"{n}: {fresh[n]:.2f}s vs anchor "
                  f"{a if a is not None else 'none'} ({ratio:.2f}x){flag}")
        print(f"family {args.family}: worst ratio {worst:.2f}x "
              f"(>1.5x and >1s on a query = reproduces in isolation = real)")
        return 0

    targets = [args.family] if args.family else sorted(fams)
    families = dict(book.get("families", {}))
    for fam in targets:
        if fam not in fams:
            raise SystemExit(f"unknown family {fam!r}; have {sorted(fams)}")
        print(f"refreshing {fam} ({len(fams[fam])} queries, fresh JVM)...",
              file=sys.stderr)
        families[fam] = run_isolated(fams[fam], args.sf or None)
    sf = args.sf or os.environ.get("SPARK_GRAFT_SF_DIR",
                                   "/root/testdata/sf0.1")
    from bench import _calibration_spin

    path.write_text(json.dumps(
        {"sf": sf, "note": "ISOLATED per-family anchors: fresh JVM per "
         "family via SPARK_GRAFT_ONLY, min-of-two steady-state passes; "
         "refresh with tools/family_anchors.py refresh",
         "calibration_spin_sec": _calibration_spin(),
         "families": {f: dict(sorted(v.items()))
                      for f, v in sorted(families.items())}},
        indent=1) + "\n")
    print(f"wrote {path.name}: "
          f"{sum(len(v) for v in families.values())} anchors "
          f"across {len(families)} families")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())

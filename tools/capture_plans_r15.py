#!/usr/bin/env python
"""Capture .explain('formatted') snapshots for the r15 optimization round.

Usage: python tools/capture_plans_r15.py before|after name1,name2,...
Writes plans/r15/<query>_<tag>.txt for each named query.

Unlike the r14 tool this also captures the plan of EVERY
localCheckpoint()ed subtree (the tests/test_plan_quality.py seam):
eager checkpoints truncate the final plan at a LogicalRDD, so the final
plan alone under-reports the computation — the committed file holds the
final plan followed by each checkpointed subtree, which together are the
whole computation. Counter lines at the top summarize both.
"""

from __future__ import annotations

import sys
from contextlib import contextmanager
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

SF = "/root/testdata/sf0.1"


@contextmanager
def captured_checkpoint_subtrees():
    try:
        from pyspark.sql.classic.dataframe import DataFrame
    except ImportError:  # pre-4.0 layout
        from pyspark.sql import DataFrame

    captured: list = []
    orig = DataFrame.localCheckpoint

    def _capture(self, *a, **kw):
        captured.append(self._jdf.queryExecution())
        return orig(self, *a, **kw)

    DataFrame.localCheckpoint = _capture
    try:
        yield captured
    finally:
        DataFrame.localCheckpoint = orig


def main() -> int:
    tag = sys.argv[1]
    names = [n for n in sys.argv[2].split(",") if n]
    from arango_clickhouse_replica_spark.queries import QUERIES
    from arango_clickhouse_replica_spark.session import get_spark

    spark = get_spark("plan-capture")
    spark.sparkContext.setLogLevel("ERROR")
    explain = spark._sc._jvm.PythonSQLUtils.explainString
    out_dir = REPO / "plans" / "r15"
    out_dir.mkdir(parents=True, exist_ok=True)
    for name in names:
        with captured_checkpoint_subtrees() as subtrees:
            df = QUERIES[name].build(spark, SF)
        final = explain(df._jdf.queryExecution(), "formatted")
        parts = [f"== FINAL PLAN ({name}) ==\n{final}"]
        for i, qe in enumerate(subtrees):
            parts.append(
                f"== CHECKPOINTED SUBTREE {i} ==\n"
                + explain(qe, "formatted")
            )
        whole = "\n".join(parts)
        n_exch = whole.count("Exchange")
        n_scan = whole.count("Scan parquet")
        n_smj = whole.count("SortMergeJoin")
        n_py = (whole.count("EvalPython") + whole.count("MapInPandas")
                + whole.count("ArrowEval"))
        header = (
            f"# {name} [{tag}] exchanges={n_exch} parquet_scans={n_scan} "
            f"sort_merge_joins={n_smj} python_nodes={n_py} "
            f"checkpointed_subtrees={len(subtrees)}\n"
        )
        (out_dir / f"{name}_{tag}.txt").write_text(header + whole)
        print(header.strip())
    return 0


if __name__ == "__main__":
    raise SystemExit(main())

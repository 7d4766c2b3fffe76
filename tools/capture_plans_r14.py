#!/usr/bin/env python
"""Capture .explain('formatted') snapshots for the optimization round.

Usage: python tools/capture_plans_r14.py before|after name1,name2,...
Writes plans/r14/<query>_<tag>.txt for each named query.
"""

from __future__ import annotations

import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

SF = "/root/testdata/sf0.1"


def main() -> int:
    tag = sys.argv[1]
    names = [n for n in sys.argv[2].split(",") if n]
    from arango_clickhouse_replica_spark.queries import QUERIES
    from arango_clickhouse_replica_spark.session import get_spark

    spark = get_spark("plan-capture")
    spark.sparkContext.setLogLevel("ERROR")
    out_dir = REPO / "plans" / "r14"
    out_dir.mkdir(parents=True, exist_ok=True)
    for name in names:
        df = QUERIES[name].build(spark, SF)
        plan = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )
        (out_dir / f"{name}_{tag}.txt").write_text(plan)
        n_exch = plan.count("Exchange")
        n_py = plan.count("EvalPython") + plan.count("MapInPandas") + plan.count("ArrowEval")
        print(f"{name}: {len(plan)}B exchanges={n_exch} python_nodes={n_py}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())

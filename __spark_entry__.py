"""Driver contract for the spark-graft builder (PySpark target).

Thin shim over ``arango_clickhouse_replica_spark.queries.QUERIES`` — the
central registry where every implemented operator from SURVEY.md §2 lives
as a named (Spark builder, DuckDB oracle SQL) pair.
"""

from __future__ import annotations

import sys
from collections.abc import Callable
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, str(Path(__file__).resolve().parent))

from arango_clickhouse_replica_spark.queries import QUERIES  # noqa: E402

SMOKE_SF_DIR = "/root/testdata/sf0.001"
FLAGSHIP = "q3_revenue_by_nation"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on sf0.001: broadcast-dim star join + grouped revenue."""
    return QUERIES[FLAGSHIP].build(spark, SMOKE_SF_DIR)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator (SURVEY.md §2)."""
    return {name: q.build for name, q in QUERIES.items()}


def oracle_sql() -> dict[str, str]:
    """DuckDB-equivalent SQL per query; omitted for non-SQL-expressible ops."""
    return {name: q.oracle for name, q in QUERIES.items() if q.oracle is not None}

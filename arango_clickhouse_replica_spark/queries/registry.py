"""Central query registry.

Every operator the engine claims (SURVEY.md §2) is registered here as a
named query: a Spark builder ``(spark, sf_dir) -> DataFrame`` plus, where
SQL-expressible, an equivalent DuckDB oracle SQL string. The driver
contract (``__spark_entry__.py``) is generated from this registry.

Determinism rules (the driver hash-compares values against DuckDB):

- Alias every computed column identically in Spark and SQL.
- Money aggregates: cast inputs to DECIMAL(18,2) before SUM (exact,
  order-independent), cast the aggregate back to DOUBLE. Identical bits on
  both engines regardless of partition/accumulation order.
- Counts: cast to BIGINT in DuckDB (its SUM(int) returns HUGEINT).
- Never emit raw double sums — doubles accumulate in partition order.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession

Builder = Callable[[SparkSession, str], DataFrame]


@dataclass(frozen=True)
class Query:
    name: str
    build: Builder
    oracle: str | None  # DuckDB SQL, or None for rows-only checks
    doc: str = ""
    tags: tuple[str, ...] = field(default_factory=tuple)


QUERIES: dict[str, Query] = {}


def query(name: str, oracle: str | None = None, tags: tuple[str, ...] = (),
          doc: str = "") -> Callable[[Builder], Builder]:
    """Decorator: register ``fn`` as the Spark builder for ``name``."""

    def wrap(fn: Builder) -> Builder:
        if name in QUERIES:
            raise ValueError(f"duplicate query name {name!r}")
        QUERIES[name] = Query(name=name, build=fn, oracle=oracle,
                              doc=doc or (fn.__doc__ or ""), tags=tags)
        return fn

    return wrap

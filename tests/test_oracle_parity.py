"""Every registered query with an oracle must hash-match DuckDB — the same
gate the driver runs (CORRECTNESS_r{N}.json), kept green locally."""

import pytest

from arango_clickhouse_replica_spark.queries import QUERIES

from .oracle_util import run_and_compare

WITH_ORACLE = [name for name, q in QUERIES.items() if q.oracle is not None]
ROWS_ONLY = [name for name, q in QUERIES.items() if q.oracle is None]


@pytest.mark.parametrize("name", WITH_ORACLE)
def test_oracle_parity(spark, duck, sf_dir, name):
    ok, msg = run_and_compare(spark, duck, QUERIES[name], sf_dir)
    assert ok, f"{name}: {msg}"


def test_every_query_has_an_oracle():
    """The registry invariant since round 4: zero rows-only entries —
    every operator the driver sees is value-hash-checked, not just
    row-counted. If this ever fails, the offending queries also need a
    rows-only smoke drive (the pre-r4 parametrized test in git history)."""
    assert ROWS_ONLY == []

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


@pytest.mark.parametrize("name", ROWS_ONLY)
def test_rows_only_queries_run(spark, sf_dir, name):
    df = QUERIES[name].build(spark, sf_dir)
    assert df.count() >= 0
    assert len(df.schema.fields) > 0

"""Z-order layout: multi-dimensional clustering must make parquet
row-group min/max stats selective on BOTH dimensions — the data-skipping
property single-key sorting cannot provide for the secondary column."""

import glob

import pyarrow.parquet as pq
import pytest
from pyspark.sql import functions as F

from arango_clickhouse_replica_spark.plans.layout import (
    write_zordered,
    zorder_value,
)
from arango_clickhouse_replica_spark.sources.tables import load_table


def _overlapping_rowgroups(path_glob: str, col_a: str, lo_a, hi_a,
                           col_b: str, lo_b, hi_b) -> tuple[int, int]:
    """(row groups whose [min,max] overlaps the box, total row groups)."""
    hit = total = 0
    for f in glob.glob(path_glob):
        meta = pq.ParquetFile(f).metadata
        names = {meta.schema.column(i).name: i
                 for i in range(meta.num_columns)}
        for rg in range(meta.num_row_groups):
            total += 1
            sa = meta.row_group(rg).column(names[col_a]).statistics
            sb = meta.row_group(rg).column(names[col_b]).statistics
            if (sa.min <= hi_a and sa.max >= lo_a
                    and sb.min <= hi_b and sb.max >= lo_b):
                hit += 1
    return hit, total


def test_zorder_value_interleaves_bits(spark):
    df = spark.range(1).select(
        zorder_value(F.lit(0b11), F.lit(0b01), bits=4).alias("z")
    )
    # x=0b11 -> bits at positions 0,2 ; y=0b01 -> bit at position 1
    assert df.collect()[0].z == 0b0111


def test_zorder_value_rejects_bad_arity(spark):
    with pytest.raises(ValueError):
        zorder_value()


def test_zordered_write_skips_on_both_dimensions(spark, sf_dir, tmp_path):
    ev = load_table(spark, "events", sf_dir).select(
        "event_id", "user_id", F.unix_timestamp("ts").alias("epoch")
    )
    n_parts, rows_per_group = 4, 500
    spark.conf.set("parquet.block.size", str(64 * 1024))

    plain = str(tmp_path / "plain")
    zord = str(tmp_path / "zord")
    # small row groups so there are enough stats entries to measure
    (ev.repartition(n_parts).write.mode("overwrite")
       .option("parquet.page.row.count.limit", rows_per_group)
       .option("parquet.block.size", 64 * 1024)
       .parquet(plain))
    write_zordered(
        ev, path=zord, zorder_cols=["user_id", "epoch"],
        num_partitions=n_parts, mode="overwrite",
    )

    # query box: a narrow slice in BOTH dimensions
    lo_u = ev.agg(F.min("user_id")).collect()[0][0]
    hi_u = lo_u + 3
    t0 = ev.agg(F.min("epoch")).collect()[0][0]
    t1 = t0 + (ev.agg(F.max("epoch")).collect()[0][0] - t0) // 8

    hit_p, tot_p = _overlapping_rowgroups(
        f"{plain}/*.parquet", "user_id", lo_u, hi_u, "epoch", t0, t1)
    hit_z, tot_z = _overlapping_rowgroups(
        f"{zord}/*.parquet", "user_id", lo_u, hi_u, "epoch", t0, t1)

    assert tot_z > 1, "need multiple row groups/files to measure skipping"
    # the unsorted layout overlaps (nearly) everywhere; z-order must skip
    assert hit_p == tot_p
    assert hit_z < tot_p, (
        f"z-order skipped nothing: {hit_z}/{tot_z} vs plain {hit_p}/{tot_p}"
    )

    # correctness: the z-ordered copy is the same relation
    got = spark.read.parquet(zord)
    assert got.count() == ev.count()
    assert got.agg(F.sum("event_id")).collect()[0][0] == \
        ev.agg(F.sum("event_id")).collect()[0][0]

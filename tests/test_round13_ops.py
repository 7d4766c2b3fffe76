"""Round-13 semantics tests: the beam-graph sub-block cap contract, the
txn-atomic persist-handle fix, and the live/batch uniq-estimate floor
parity (ADVICE r12 items)."""

import math

from pyspark.sql import functions as F


def test_graph_cell_cap_holds_at_oracle_scales(spark):
    """ann_graph_beam_topk's DuckDB oracle replays the edge build WITHOUT
    the sub-block term; that is exact only while every IVF cell stays
    under _GRAPH_CELL_CAP. Assert the contract at every scale the driver
    hash-verifies (sf0.001 and sf0.01) so a future overflow fails here by
    name instead of as a mystery hash mismatch."""
    from arango_clickhouse_replica_spark.queries.embed_ops import (
        _GRAPH_CELL_CAP,
        _graph_members,
    )

    for sf_dir in ("/root/testdata/sf0.001", "/root/testdata/sf0.01"):
        _, _, members = _graph_members(spark, sf_dir)
        worst = (
            members.groupBy("cell")
            .count()
            .agg(F.max("count").alias("mx"))
            .collect()[0]["mx"]
        )
        assert worst <= _GRAPH_CELL_CAP, (
            f"{sf_dir}: largest graph cell {worst} exceeds the "
            f"{_GRAPH_CELL_CAP} sub-block cap — the oracle no longer "
            "replays the edge build; model the sub-block split in the "
            "oracle or re-balance the cells"
        )


def test_uniq_estimate_floor_matches_batch_semantics():
    """The live twin must compute floor(NUM / sum_u) exactly like the
    batch F.floor(lit / col): Python's float // is fmod-based and can
    differ by 1 from floor-of-IEEE-quotient (the 0.5 // 0.1 class)."""
    # a sum_u where x/y rounds to an exact integer above the true
    # quotient: float-// gives floor(fmod-corrected) = n-1, floor(x/y)=n
    cases = [(0.5, 0.1), (2.7, 0.9), (1.2, 0.4)]
    assert any(math.floor(x / y) != x // y for x, y in cases)
    # the shipped expression uses math.floor of the quotient
    import inspect

    from arango_clickhouse_replica_spark.streaming import stateful

    src = inspect.getsource(stateful)
    assert "math.floor(_AGGSTATE_NUM / float(sum(u)))" in src
    assert "_AGGSTATE_NUM // " not in src


def test_txn_atomic_batch_unpersists_raw_handle(spark, tmp_path):
    """ADVICE r12: _txn_gate rebinds the local `batch` name, so the
    finally-block unpersist used to release the WRONG frame and the
    pinned raw batch leaked every micro-batch. Drive one txn-atomic
    batch and assert nothing is left in the storage layer."""
    from pyspark.sql import types as T

    from arango_clickhouse_replica_spark.streaming import CdcPipeline

    env = T.StructType([
        T.StructField("tick", T.LongType()),
        T.StructField("type", T.IntegerType()),
        T.StructField("cuid", T.StringType()),
        T.StructField("tid", T.StringType()),
        T.StructField("data", T.StructType([
            T.StructField("event_id", T.LongType()),
            T.StructField("value", T.DoubleType()),
        ])),
    ])
    batch = spark.createDataFrame(
        [
            (10, 2300, "c", "T1", (1, 1.0)),
            (11, 2201, "c", "T1", None),  # commit marker
        ],
        env,
    )
    pipe = CdcPipeline(
        spark,
        target_dir=str(tmp_path / "t"),
        checkpoint_dir=str(tmp_path / "cp"),
        keys=["event_id"],
        txn_atomic=True,
    )
    before = {
        r.id() for r in spark.sparkContext._jsc.sc().getRDDStorageInfo()
    }
    pipe._apply_batch(batch, 0)
    after = spark.sparkContext._jsc.sc().getRDDStorageInfo()
    leaked = [r for r in after if r.id() not in before]
    assert leaked == [], f"persisted RDDs leaked by _apply_batch: {leaked}"


def test_uniq_upto_saturates_at_cap(spark):
    """uniqUpTo(N): exact below N, pinned to N+1 above — verified against
    an independent exact distinct count at sf0.01, where the fixture's
    (type, grp) groups straddle the cap."""
    from arango_clickhouse_replica_spark.queries import QUERIES
    from arango_clickhouse_replica_spark.queries.analytics import (
        _UNIQ_UPTO_N,
    )

    sf_dir = "/root/testdata/sf0.01"
    got = {
        (r["event_type"], r["grp"]): (r["uniq_upto"], r["saturated"])
        for r in QUERIES["q_clickhouse_uniq_upto_parity"]
        .build(spark, sf_dir).collect()
    }
    from arango_clickhouse_replica_spark.sources.tables import load_table

    exact = {
        (r["event_type"], r["grp"]): r["n"]
        for r in load_table(spark, "events", sf_dir)
        .groupBy("event_type", (F.col("event_id") % 16).alias("grp"))
        .agg(F.countDistinct("user_id").alias("n"))
        .collect()
    }
    assert set(got) == set(exact)
    saturated_seen = unsaturated_seen = False
    for k, (upto, sat) in got.items():
        expect = min(exact[k], _UNIQ_UPTO_N + 1)
        assert upto == expect, (k, upto, exact[k])
        assert sat == (1 if exact[k] > _UNIQ_UPTO_N else 0)
        saturated_seen |= sat == 1
        unsaturated_seen |= sat == 0
    assert saturated_seen, "fixture never saturates the cap"


def test_topk_weighted_cells_ordered_and_bounded(spark, sf_dir):
    from arango_clickhouse_replica_spark.queries import QUERIES

    rows = QUERIES["q_clickhouse_topk_weighted_parity"].build(
        spark, sf_dir
    ).collect()
    assert rows
    for r in rows:
        pairs = [p.split(":") for p in r["topk_csv"].split(",")]
        assert 1 <= len(pairs) <= 5 and len(pairs) == r["k"]
        weights = [int(w) for _, w in pairs]
        assert weights == sorted(weights, reverse=True)
        users = [int(u) for u, _ in pairs]
        assert len(set(users)) == len(users)


def test_incremental_search_never_returns_deleted(spark, sf_dir):
    from arango_clickhouse_replica_spark.queries import QUERIES
    from arango_clickhouse_replica_spark.sources.tables import load_table

    got = QUERIES["ann_incremental_search_read"].build(
        spark, sf_dir
    ).collect()
    assert got
    deleted = {
        r["vec_id"] for r in load_table(spark, "embeddings", sf_dir)
        .filter(F.col("vec_id") % 20 == 7).select("vec_id").collect()
    }
    assert not {r["neighbor_id"] for r in got} & deleted
    assert not {r["query_id"] for r in got} & deleted
    per_q = {}
    for r in got:
        per_q.setdefault(r["query_id"], []).append(
            (r["rank"], r["cos_sim"], r["neighbor_id"])
        )
    for q_id, rr in per_q.items():
        rr.sort()
        sims = [s for _, s, _ in rr]
        assert sims == sorted(sims, reverse=True), q_id


def test_streaming_projection_cost_matches_batch(spark, sf_dir, tmp_path):
    """Drained per-(order, granule) emissions (last per key) must fold
    into exactly the batch advisor's cost columns — the projection
    read-cost report kept current without a table scan."""
    from arango_clickhouse_replica_spark.queries import QUERIES
    from arango_clickhouse_replica_spark.queries.cdc_queries import (
        projection_flagged,
    )
    from arango_clickhouse_replica_spark.streaming.stateful import (
        streaming_projection_cost_monitor,
    )

    flagged, _ = projection_flagged(spark, sf_dir)
    src = str(tmp_path / "src")
    # two arbitrary micro-batches split by a content hash
    h = F.crc32(F.concat_ws("|", "proj_order", "g", "q_point_type"))
    flagged.filter(h % 2 == 0).coalesce(1).write.mode("append").parquet(src)
    flagged.filter(h % 2 == 1).coalesce(1).write.mode("append").parquet(src)

    q = (
        streaming_projection_cost_monitor(
            spark.readStream.schema(flagged.schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(src)
        )
        .writeStream.format("memory")
        .queryName("projcost_t")
        .outputMode("update")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()

    emitted = spark.sql(
        """SELECT proj_order, g, n, m_point_type, m_point_user,
                  m_recent_ts, m_high_value FROM (
             SELECT *, ROW_NUMBER() OVER (
               PARTITION BY proj_order, g ORDER BY n DESC) AS rn
             FROM projcost_t) WHERE rn = 1"""
    )
    live_cost = {}
    for r in emitted.collect():
        for qid, m in (
            ("point_type", r["m_point_type"]),
            ("point_user", r["m_point_user"]),
            ("recent_ts", r["m_recent_ts"]),
            ("high_value", r["m_high_value"]),
        ):
            k = (r["proj_order"], qid)
            nm, gs, rs = live_cost.get(k, (0, 0, 0))
            live_cost[k] = (
                nm + m,
                gs + (1 if m > 0 else 0),
                rs + (r["n"] if m > 0 else 0),
            )
    batch = {
        (r["proj_order"], r["query_id"]): (
            r["n_match"], r["granules_scanned"], r["rows_scanned"]
        )
        for r in QUERIES["cdc_projection_advisor"].build(
            spark, sf_dir
        ).collect()
    }
    assert live_cost == batch


def test_tga_codec_roundtrip_both_types():
    """Both TGA lanes roundtrip exactly: type-2 bottom-up (decoder must
    flip) and type-10 RLE top-down (run + raw packets, never crossing a
    scan line); truncated RLE raises instead of mis-indexing."""
    import pytest

    from arango_clickhouse_replica_spark.operators.media_codecs import (
        decode_tga,
        encode_tga_gray8,
    )

    for d in range(8):
        w, h = 10 + d % 7, 5 + d % 6
        px = [(d * 11 + 3 * y + x // 4) % 256
              for y in range(h) for x in range(w)]
        for rle in (False, True):
            out = decode_tga(encode_tga_gray8(px, w, h, rle=rle))
            assert out["pixels"] == px
            assert out["rle"] == rle
            assert (out["width"], out["height"]) == (w, h)

    blob = encode_tga_gray8([5] * 40, 8, 5, rle=True)
    with pytest.raises(ValueError):
        decode_tga(blob[:-4])
    # an RLE stream that overruns the raster is rejected too
    import struct as _struct

    head = _struct.pack("<BBBHHBHHHHBB", 0, 0, 10, 0, 0, 0, 0, 0,
                        4, 1, 24, 0x20)
    overrun = head + bytes([0x87, 9, 9, 9])  # run of 8 into a 4-pixel row
    with pytest.raises(ValueError):
        decode_tga(overrun)

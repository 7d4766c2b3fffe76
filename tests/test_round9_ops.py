"""Round-9 semantics tests: the ANN query-set Q_MAX cap (VERDICT r8
items 1-2) must structurally bind — not just be policy prose.

The sf fixtures never exceed Q_MAX/100 qualifying vectors, so the
driver-oracle rows can't distinguish capped from uncapped; these tests
build a synthetic table where the vec_id % 100 == 0 slice EXCEEDS
Q_MAX and prove the collected/broadcast query set stays at exactly
Q_MAX rows — the smallest vec_ids, per the orderBy.
"""

from pyspark.sql import functions as F

from arango_clickhouse_replica_spark.queries.embed_ops import (
    _shortlist_candidates,
)
from arango_clickhouse_replica_spark.queries.llm_ops import Q_MAX


def _synthetic_base(spark, n):
    # every vec_id is a multiple of 100 -> the whole table qualifies as
    # a query; embeddings are deterministic non-degenerate 2-vectors
    return spark.range(n).select(
        (F.col("id") * 100).alias("vec_id"),
        F.array(
            ((F.col("id") % 7) + 1).cast("double"),
            ((F.col("id") % 5) + 1).cast("double"),
        ).alias("embedding"),
    )


def test_shortlist_query_set_cap_binds(spark):
    n = Q_MAX + 400
    base = _synthetic_base(spark, n)
    out = _shortlist_candidates(spark, base, k=1, exclude="self")
    qs = [r.query_id for r in out.select("query_id").distinct().collect()]
    assert len(qs) == Q_MAX
    # orderBy("vec_id") before the limit -> exactly the smallest ids
    assert max(qs) == (Q_MAX - 1) * 100
    # every shortlist row's query is inside the capped set
    assert min(qs) == 0


def test_streaming_zscore_skips_null_values(spark, tmp_path):
    """ADVICE r8: a null event value must neither crash the scorer
    (NaN -> Decimal quantize raised) nor occupy a frame slot — both
    engines now exclude nulls BEFORE the window, so stream == batch
    bit for bit on data WITH nulls."""
    import datetime

    from arango_clickhouse_replica_spark.queries.analytics import (
        anomaly_scored_events,
    )
    from arango_clickhouse_replica_spark.streaming.stateful import (
        streaming_anomaly_zscore,
    )

    t0 = datetime.datetime(2026, 1, 1)
    rows = []
    for i in range(30):
        # nulls sprinkled mid-window: positions 3, 12, 17
        v = None if i in (3, 12, 17) else float((i * 7) % 13) + 0.5
        rows.append((i, t0 + datetime.timedelta(seconds=i), 1, v))
    ev = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, value double"
    )
    src, ckpt, out = (
        str(tmp_path / "src"), str(tmp_path / "ckpt"), str(tmp_path / "out")
    )
    ev.coalesce(1).write.parquet(src)
    q = (
        streaming_anomaly_zscore(
            spark.readStream.schema(ev.schema).parquet(src)
        )
        .writeStream.format("parquet")
        .option("path", out)
        .outputMode("append")
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    got = {
        r.event_id: r.z for r in spark.read.parquet(out).collect()
    }
    want = {r.event_id: r.z for r in anomaly_scored_events(ev).collect()}
    assert got == want and len(want) > 0
    assert not any(eid in got for eid in (3, 12, 17))


def test_bruteforce_query_side_is_bounded(spark, sf_dir):
    """The broadcast q side of ann_cosine_topk_bruteforce must carry a
    GlobalLimit/TakeOrdered bound so the BNLJ loop is O(Q_MAX*N)."""
    from arango_clickhouse_replica_spark.queries import QUERIES

    df = QUERIES["ann_cosine_topk_bruteforce"].build(spark, sf_dir)
    plan = df._jdf.queryExecution().optimizedPlan().toString()
    assert f"GlobalLimit {Q_MAX}" in plan or f"limit={Q_MAX}" in plan, plan


def test_jpeg_dc_stats_match_full_decode_on_flat_blocks():
    """The DC-image fast path (decode_jpeg_gray8_dc_stats) must be
    bit-equal to the full decoder's pixel moments on flat-block frames
    — the property that lets mm_video_frame_dedup skip the IDCT."""
    from arango_clickhouse_replica_spark.operators.media_codecs import (
        decode_jpeg_gray8,
        decode_jpeg_gray8_dc_stats,
        encode_jpeg_gray8,
    )

    # flat 8x8 blocks at assorted levels, 16x16 image = 4 blocks
    for levels in ([16, 254, 17, 128], [0, 255, 77, 78], [200, 200, 1, 99]):
        px = bytearray(16 * 16)
        for bi, lv in enumerate(levels):
            by, bx = divmod(bi, 2)
            for y in range(8):
                for x in range(8):
                    px[(by * 8 + y) * 16 + bx * 8 + x] = lv
        payload = encode_jpeg_gray8(bytes(px), 16, 16)
        full = decode_jpeg_gray8(payload)
        fp = full["pixels"]
        dc = decode_jpeg_gray8_dc_stats(payload)
        assert dc["width"] == 16 and dc["height"] == 16
        assert dc["sum_pixels"] == sum(fp)
        assert dc["px_min"] == min(fp)
        assert dc["px_max"] == max(fp)


def test_jpeg_dc_stats_general_content_is_dc_image():
    """On NON-flat content the DC path returns block-mean statistics
    (the documented Yeo-Liu DC image), bounded by the true pixel
    range — never an error."""
    from arango_clickhouse_replica_spark.operators.media_codecs import (
        decode_jpeg_gray8,
        decode_jpeg_gray8_dc_stats,
        encode_jpeg_gray8,
    )

    px = bytes((7 * x + 13 * y) % 256 for y in range(16) for x in range(16))
    payload = encode_jpeg_gray8(px, 16, 16)
    full = decode_jpeg_gray8(payload)["pixels"]
    dc = decode_jpeg_gray8_dc_stats(payload)
    assert dc["n_blocks"] == 4
    # block means sit inside the decoded pixel range
    assert min(full) <= dc["px_min"] <= dc["px_max"] <= max(full)
    # total mass within one quantization step per block of the truth
    assert abs(dc["sum_pixels"] - sum(full)) <= 64 * 4 * 8


def test_watermark_helper_matches_sized_relation(spark, sf_dir):
    """streaming/windows.size_watermark_from_lateness must agree with
    the oracle-checked cdc_watermark_sizing relation (one policy, one
    number)."""
    from arango_clickhouse_replica_spark.queries import QUERIES
    from arango_clickhouse_replica_spark.streaming.windows import (
        size_watermark_from_lateness,
    )

    row = QUERIES["cdc_watermark_sizing"].build(spark, sf_dir).collect()[0]
    assert size_watermark_from_lateness(spark, sf_dir) == (
        f"{row.sized_delay_s} seconds"
    )
    # the natural fixture is in order: the floor dominates
    assert row.n_late == 0 and row.sized_delay_s == 60


def test_anneal_mixture_invariants(spark, sf_dir):
    """Shares sum to ~1 per phase, the anneal phase upweights
    high-quality sources relative to raw mass, and effective epochs
    are consistent with the declared budget split."""
    from arango_clickhouse_replica_spark.queries import QUERIES

    rows = QUERIES["curation_anneal_mixture"].build(spark, sf_dir).collect()
    phases = {}
    for r in rows:
        phases.setdefault(r.phase, []).append(r)
    assert set(phases) == {"pretrain", "anneal"}
    for ph, rs in phases.items():
        assert abs(sum(r.share for r in rs) - 1.0) < 1e-3, ph
        for r in rs:
            if r.eligible_tokens:
                total = sum(x.n_tokens for x in rs)
                frac = 0.9 if ph == "pretrain" else 0.1
                want = frac * total * r.share / r.eligible_tokens
                assert abs(r.effective_epochs - want) < 1e-5
    # the gate must actually split the corpus (non-degenerate anneal)
    ann = phases["anneal"]
    assert 0 < sum(r.eligible_tokens for r in ann) < sum(r.n_tokens for r in ann)

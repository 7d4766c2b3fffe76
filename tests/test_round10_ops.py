"""Round-10 semantics tests: crafted-input edge coverage for the new
operators (the driver oracle proves engine parity at the fixture SFs;
these prove the SEMANTICS on inputs the fixtures don't contain)."""

from pyspark.sql import functions as F

from arango_clickhouse_replica_spark.queries.llm_ops import (
    _CANON_STEPS_SQL,
    _URL_SQL,
)
from arango_clickhouse_replica_spark.queries import QUERIES

SF = "/root/testdata/sf0.001"


def test_url_canonicalizer_rules(spark):
    """Every canonicalization rule fires: scheme, www, query, fragment,
    trailing slash — and plain URLs pass through untouched."""
    cases = [
        ("https://www.ex1.com/p/9?utm_source=feed#sec", "ex1.com/p/9"),
        ("http://ex2.com/p/3/", "ex2.com/p/3"),
        ("https://ex3.com/p/4", "ex3.com/p/4"),
        ("http://www.ex4.com/p/5#frag", "ex4.com/p/5"),
        ("https://ex5.com/p/6?id=6", "ex5.com/p/6"),
        ("https://ex6.com/p/7///", "ex6.com/p/7"),
    ]
    df = spark.createDataFrame(cases, ["url", "want"]).select(
        "want", F.expr(_CANON_STEPS_SQL.format(u="url")).alias("got")
    )
    for r in df.collect():
        assert r.got == r.want, (r.want, r.got)


def test_url_synth_produces_collidable_variants(spark):
    """The synthetic URL lane must actually produce groups where raw
    URLs differ but canonicals collide — otherwise the dedup tests
    nothing."""
    df = spark.range(600).select(F.col("id").alias("doc_id")).select(
        "doc_id", F.expr(_URL_SQL).alias("url")
    ).select(
        "url", F.expr(_CANON_STEPS_SQL.format(u="url")).alias("canonical")
    )
    g = df.groupBy("canonical").agg(
        F.count_distinct("url").alias("variants")
    )
    assert g.filter(F.col("variants") >= 2).count() > 0


def test_event_path_order_and_tiebreak(spark, tmp_path):
    """Path order follows (ts, event_id) including the event_id
    tiebreak on equal timestamps; users with < K events keep short
    paths."""
    import datetime as dt

    t0 = dt.datetime(2024, 1, 1)
    rows = [
        # user 1: 6 events, two sharing a timestamp (ids 3 < 4 break it)
        (1, t0, 1, "view"), (1, t0.replace(minute=1), 2, "click"),
        (1, t0.replace(minute=2), 3, "view"),
        (1, t0.replace(minute=2), 4, "purchase"),
        (1, t0.replace(minute=3), 5, "error"),
        (1, t0.replace(minute=4), 6, "signup"),
        # user 2: only 2 events
        (2, t0, 7, "signup"), (2, t0.replace(minute=9), 8, "view"),
    ]
    df = spark.createDataFrame(
        rows, ["user_id", "ts", "event_id", "event_type"]
    ).withColumn("value", F.lit(0.0)).withColumn("props", F.lit("{}"))
    d = str(tmp_path / "events.parquet")
    df.write.mode("overwrite").parquet(d)
    # the query loads <sf_dir>/events.parquet
    out = {
        r.path: (r.path_len, r.n_users)
        for r in QUERIES["q_event_path_topk"].build(
            spark, str(tmp_path)
        ).collect()
    }
    assert out["view>click>view>purchase>error"] == (5, 1)
    assert out["signup>view"] == (2, 1)


def test_bitmap_census_inclusion_exclusion(spark):
    """AND + XOR == OR on every pair, and OR never exceeds the user
    universe."""
    rows = QUERIES["q_bitmap_segment_census"].build(spark, SF).collect()
    assert rows, "no pairs"
    for r in rows:
        assert r.n_and + r.n_xor == r.n_or
        assert r.n_and <= min(r.n_a, r.n_b)
        assert r.n_or >= max(r.n_a, r.n_b)


def test_readability_hand_computed(spark, tmp_path):
    """One crafted doc checked against hand-computed milli-values."""
    text = "The cat sat. The dog ran away!"
    # words: The cat sat. The dog ran away!  -> 7 words
    # sentences: [.!?]+ runs -> 2
    # syllables (vowel groups, floor 1): the=1 cat=1 sat.=1 the=1 dog=1
    #   ran=1 away!=2  -> 8
    wps = 7 * 1000 // 2          # 3500
    spw = 8 * 1000 // 7          # 1142
    flesch = 206835 - (1015 * wps) // 1000 - (84600 * spw) // 1000
    fk = (390 * wps) // 1000 + (11800 * spw) // 1000 - 15590
    df = spark.createDataFrame(
        [(1, text, "en", "srcX", len(text))],
        ["doc_id", "text", "lang", "source", "n_chars"],
    )
    d = str(tmp_path / "documents.parquet")
    df.write.mode("overwrite").parquet(d)
    row = QUERIES["text_readability_report"].build(
        spark, str(tmp_path)
    ).collect()[0]
    assert row.n_docs == 1
    assert row.mean_flesch_milli == flesch
    assert row.mean_fk_milli == fk


def test_surprisal_weights_normalized_and_ordered(spark):
    rows = QUERIES["curation_excess_surprisal_reweight"].build(
        spark, SF
    ).collect()
    assert rows
    total = sum(r.weight_per_mille for r in rows)
    assert total <= 1000  # trunc-div normalization never overshoots
    assert total >= 1000 - len(rows)  # and loses at most 1 per source
    # weight is a monotone function of the CLAMPED excess (negative
    # excesses share the baseline score; trunc-div can tie neighbors)
    for a in rows:
        for b in rows:
            if max(a.excess_milli, 0) > max(b.excess_milli, 0):
                assert a.weight_per_mille >= b.weight_per_mille, (a, b)


def test_sketch_intersection_algebra(spark):
    rows = QUERIES["q_sketch_intersection_estimate"].build(
        spark, SF
    ).collect()
    assert rows
    for r in rows:
        assert r.est_union <= r.est_a + r.est_b
        assert r.est_union >= max(r.est_a, r.est_b) - 1  # fold is a min
        assert r.est_intersection >= 0


def test_bmp_codec_byte_level():
    """Round-trip, top-down orientation, padding, and error paths of
    the pure-stdlib BMP codec."""
    import struct

    import pytest

    from arango_clickhouse_replica_spark.operators.media_codecs import (
        decode_bmp,
        encode_bmp_gray8,
    )

    # round-trip at a width whose raw stride (3*13=39) needs 1 pad byte
    px = bytes((11 * d) % 256 for d in range(13 * 5))
    bmp = encode_bmp_gray8(px, 13, 5)
    out = decode_bmp(bmp)
    assert (out["width"], out["height"]) == (13, 5)
    assert bytes(out["pixels"]) == px
    assert not out["top_down"]
    # declared file size matches layout arithmetic: 54 + stride*h
    assert len(bmp) == 54 + ((3 * 13 + 3) & ~3) * 5
    assert struct.unpack_from("<I", bmp, 2)[0] == len(bmp)

    # top-down variant (negative height): rows must come back reversed
    td = bytearray(bmp)
    struct.pack_into("<i", td, 22, -5)
    out2 = decode_bmp(bytes(td))
    assert out2["top_down"] and out2["height"] == 5
    rows = [px[y * 13:(y + 1) * 13] for y in range(5)]
    flipped = b"".join(reversed(rows))
    assert bytes(out2["pixels"]) == flipped

    # zero-pad width (3*16=48 already 4-aligned)
    px16 = bytes(range(16 * 2))
    assert bytes(decode_bmp(encode_bmp_gray8(px16, 16, 2))["pixels"]) == px16

    with pytest.raises(ValueError):
        decode_bmp(b"PNG" + bmp[3:])
    with pytest.raises(ValueError):
        decode_bmp(bmp[:53])
    bad = bytearray(bmp)
    struct.pack_into("<H", bad, 28, 8)  # 8 bpp unsupported
    with pytest.raises(ValueError):
        decode_bmp(bytes(bad))
    with pytest.raises(ValueError):
        decode_bmp(bmp[:-4])  # truncated pixel data


def test_bmp_luma_is_itu601_for_color():
    """Hand-built color BMP: the decoder's integer luma must follow the
    299/587/114 milli-weights, not just pass gray through."""
    import struct

    from arango_clickhouse_replica_spark.operators.media_codecs import (
        decode_bmp,
    )

    # 1x1, pixel B=10 G=20 R=30 -> luma (299*30+587*20+114*10)//1000 = 21
    stride = 4  # 3 bytes + 1 pad
    fh = b"BM" + struct.pack("<IHHI", 54 + stride, 0, 0, 54)
    ih = struct.pack("<IiiHHIIiiII", 40, 1, 1, 1, 24, 0, stride,
                     2835, 2835, 0, 0)
    payload = fh + ih + bytes([10, 20, 30, 0])
    out = decode_bmp(payload)
    assert out["pixels"] == [(299 * 30 + 587 * 20 + 114 * 10) // 1000]


def test_sequence_count_greedy_semantics(spark, tmp_path):
    """Greedy non-overlapping matching pinned against hand-run cases:
    a second view never stacks, steps are consumed in order, and the
    3-step pattern resets only on completion."""
    import datetime as dt

    t0 = dt.datetime(2024, 1, 1)
    types = [
        # v v c c  -> vc: first v arms, first c fires (1); second c idle
        # v c v c  would be 2 — covered by user 2
        "view", "view", "click", "click",        # user 1: vc=1
    ]
    rows = [(1, t0.replace(minute=i), i + 1, t) for i, t in enumerate(types)]
    types2 = ["view", "click", "error", "view", "purchase", "click",
              "purchase"]
    # user 2: vc greedy: v c (1) ... v ... c (2)        -> 2
    # vcp: v->c->p completes at first purchase (1); then click purchase
    #      lacks a new view                              -> 1
    rows += [(2, t0.replace(minute=i), 100 + i, t)
             for i, t in enumerate(types2)]
    df = spark.createDataFrame(
        rows, ["user_id", "ts", "event_id", "event_type"]
    ).withColumn("value", F.lit(0.0)).withColumn("props", F.lit("{}"))
    df.write.mode("overwrite").parquet(str(tmp_path / "events.parquet"))
    out = {
        r.user_id: (r.seq_count_vc, r.seq_count_vcp)
        for r in QUERIES["q_clickhouse_sequence_count"].build(
            spark, str(tmp_path)
        ).collect()
    }
    assert out[1] == (1, 0)
    assert out[2] == (2, 1)


def test_time_travel_read_semantics(spark, tmp_path):
    """Post-T updates are invisible and post-T deletes leave the key
    visible at its pre-T value — the audit semantics time travel
    exists for. Crafted so T = max_ver div 2 lands between the base
    upserts and the late mutations."""
    import datetime as dt

    t0 = dt.datetime(2024, 1, 1)
    # synthetic envelope scheme: base _ver = 2*id; id%10==0 gets an
    # update at 2*id+1; id%20==7 gets a delete at 2*id+1.
    # ids chosen so T = max_ver div 2 = 54 lands EXACTLY on key 27's
    # base (delete at 55 is post-T -> the key reappears)
    ids = [1, 7, 10, 27, 54]
    rows = [(i, t0, i % 7, "view", float(i), "{}") for i in ids]
    df = spark.createDataFrame(
        rows, ["event_id", "ts", "user_id", "event_type", "value", "props"]
    )
    df.write.mode("overwrite").parquet(str(tmp_path / "events.parquet"))
    out = {
        r.event_id: (r.value, r.as_of_ver)
        for r in QUERIES["cdc_time_travel_read"].build(
            spark, str(tmp_path)
        ).collect()
    }
    # max_ver = 108 (base of id 54) -> T = 54
    assert out[27] == (27.0, 54)      # delete (_ver 55) > T: REAPPEARS
    assert out[10] == (1010.0, 21)    # update (_ver 21) <= T: visible
    assert 7 not in out               # delete (_ver 15) <= T: gone
    assert 54 not in out              # base (_ver 108) > T: not yet born
    assert out[1] == (1.0, 2)


def test_strict_funnel_abort_on_interloper(spark, tmp_path):
    """An interleaving event aborts the strict chain where the
    non-strict funnel would skip it."""
    import datetime as dt

    t0 = dt.datetime(2024, 1, 1)
    rows = [
        # user 1: view, error, click -> strict aborts at error (best 1)
        (1, t0, 1, "view"), (1, t0.replace(minute=1), 2, "error"),
        (1, t0.replace(minute=2), 3, "click"),
        # user 2: clean view, click, purchase -> 3
        (2, t0, 4, "view"), (2, t0.replace(minute=1), 5, "click"),
        (2, t0.replace(minute=2), 6, "purchase"),
    ]
    df = spark.createDataFrame(
        rows, ["user_id", "ts", "event_id", "event_type"]
    ).withColumn("value", F.lit(0.0)).withColumn("props", F.lit("{}"))
    df.write.mode("overwrite").parquet(str(tmp_path / "events.parquet"))
    hist = {
        r.level: r.n_users
        for r in QUERIES["q_window_funnel_strict"].build(
            spark, str(tmp_path)
        ).collect()
    }
    assert hist == {1: 1, 3: 1}
    # the non-strict funnel skips the interloper: user 1 reaches 2
    loose = {
        r.level: r.n_users
        for r in QUERIES["q_clickhouse_window_funnel"].build(
            spark, str(tmp_path)
        ).collect()
    }
    assert loose == {2: 1, 3: 1}


def test_migration_plan_ddl_text(spark):
    rows = {
        r.json_key: r
        for r in QUERIES["cdc_schema_migration_plan"].build(
            spark, SF
        ).collect()
    }
    assert rows["val"].status == "added"
    assert rows["val"].inferred_type == "Float64"
    assert rows["val"].migration_sql == (
        "ALTER TABLE events_rmt ADD COLUMN IF NOT EXISTS `val` Float64"
        " -- first seen in producer v2"
    )
    assert rows["value"].status == "retired"
    assert "stop strict-casting" in rows["value"].migration_sql
    assert rows["event_id"].status == "stable"


def test_funnel_latency_bins(spark, tmp_path):
    """A 3-second conversion lands in log2 bin 1 (floor(log2 3)); a
    sub-second one clamps to the 1s bin (bin 0)."""
    import datetime as dt

    t0 = dt.datetime(2024, 1, 1)
    rows = [
        (1, t0, 1, "view"), (1, t0 + dt.timedelta(seconds=1), 2, "click"),
        (1, t0 + dt.timedelta(seconds=3), 3, "purchase"),
        (2, t0, 4, "view"),
        (2, t0 + dt.timedelta(milliseconds=100), 5, "click"),
        (2, t0 + dt.timedelta(milliseconds=300), 6, "purchase"),
    ]
    df = spark.createDataFrame(
        rows, ["user_id", "ts", "event_id", "event_type"]
    ).withColumn("value", F.lit(0.0)).withColumn("props", F.lit("{}"))
    df.write.mode("overwrite").parquet(str(tmp_path / "events.parquet"))
    out = {
        r.log2_secs_bin: (r.bin_floor_s, r.n_users, r.min_s, r.max_s)
        for r in QUERIES["q_funnel_latency_histogram"].build(
            spark, str(tmp_path)
        ).collect()
    }
    assert out[1] == (2, 1, 3, 3)
    assert out[0] == (1, 1, 1, 1)  # sub-second clamps to 1s


def test_resync_plan_regimes(spark):
    # sf0.01: the simulated dropped page (dense ticks 1000-2999) sits
    # in the interior of shard 6's tick range
    rows = {
        r.cuid: r
        for r in QUERIES["cdc_resync_catchup_plan"].build(
            spark, "/root/testdata/sf0.01"
        ).collect()
    }
    assert rows["c_0"].decision == "healthy" and rows["c_0"].n_missing == 0
    assert rows["c_7"].decision == "resync"       # every 3rd tick lost
    assert rows["c_6"].decision == "resync"       # dropped page
    assert rows["c_6"].max_gap > 100
    # some shard should be merely catchup-able
    assert any(r.decision == "catchup" for r in rows.values())

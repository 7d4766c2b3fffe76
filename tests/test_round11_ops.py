"""Round-11 semantics tests: crafted-input edge coverage for the new
operators (the driver oracle proves engine parity at the fixture SFs;
these prove the SEMANTICS on inputs the fixtures don't contain)."""

import datetime as dt
import hashlib

from pyspark.sql import functions as F

from arango_clickhouse_replica_spark.queries import QUERIES

T0 = dt.datetime(2024, 1, 1)


def _events(spark, rows, path):
    """rows: (user_id, ts, event_id, event_type, value)."""
    df = spark.createDataFrame(
        rows, ["user_id", "ts", "event_id", "event_type", "value"]
    ).withColumn("props", F.lit("{}"))
    df.write.mode("overwrite").parquet(str(path / "events.parquet"))


def test_sample_by_hash_user_coherent(spark, tmp_path):
    """Membership is decided by md5(user_id) alone: a sampled user's
    events are ALL in (entity-coherent sampling), an unsampled user's
    are ALL out, and the x8 scale-up is exact integer arithmetic."""
    in_uid = next(
        u for u in range(1, 500)
        if hashlib.md5(str(u).encode()).hexdigest()[0] in "01"
    )
    out_uid = next(
        u for u in range(1, 500)
        if hashlib.md5(str(u).encode()).hexdigest()[0] not in "01"
    )
    rows = [
        (in_uid, T0, 1, "view", 1.0),
        (in_uid, T0.replace(minute=1), 2, "view", 2.5),
        (out_uid, T0, 3, "view", 100.0),
        (out_uid, T0.replace(minute=2), 4, "click", 9.0),
    ]
    _events(spark, rows, tmp_path)
    out = {
        r.event_type: r
        for r in QUERIES["q_sample_by_hash_parity"].build(
            spark, str(tmp_path)
        ).collect()
    }
    assert set(out) == {"view"}  # out_uid's click row never appears
    v = out["view"]
    assert (v.n_sampled, v.n_users_sampled) == (2, 1)
    assert v.v_milli_sampled == 1000 + 2500
    assert v.n_scaled == 16 and v.v_milli_scaled == 28000


def test_counter_rate_reset_semantics(spark, tmp_path):
    """increase() counts positive deltas; a drop is a restart whose new
    value is counted in full; the first sample contributes nothing; the
    event_id tiebreak orders equal timestamps."""
    rows = [
        # user 1: 10 -> 25 -> 5 (reset) -> 7; increase = 15 + 5 + 2
        (1, T0, 1, "view", 0.010),
        (1, T0.replace(minute=1), 2, "view", 0.025),
        (1, T0.replace(minute=2), 3, "view", 0.005),
        (1, T0.replace(minute=3), 4, "view", 0.007),
        # user 2: equal ts, ids 6 < 7 order it: 30 then 10 -> one reset
        (2, T0, 6, "view", 0.030),
        (2, T0, 7, "view", 0.010),
        # user 3: single sample -> increase 0, no resets
        (3, T0, 8, "view", 0.099),
    ]
    _events(spark, rows, tmp_path)
    out = {
        r.user_id: (r.n_samples, r.n_resets, r.increase_milli)
        for r in QUERIES["q_counter_rate_resets"].build(
            spark, str(tmp_path)
        ).collect()
    }
    assert out[1] == (4, 1, 22)
    assert out[2] == (2, 1, 10)
    assert out[3] == (1, 0, 0)


def test_combinators_masking(spark, tmp_path):
    """Each -If combinator masks independently: rows below the
    threshold feed max_if_low but not sum/count/uniq_if_high; avgIf is
    sum/count over the masked subset only; an all-low group yields NULL
    min_if_high and 0 counts."""
    rows = [
        (1, T0, 1, "view", 60.0),    # high
        (2, T0, 2, "view", 70.0),    # high
        (2, T0, 3, "view", 10.0),    # low
        (3, T0, 4, "click", 5.0),    # low only -> click has no highs
    ]
    _events(spark, rows, tmp_path)
    out = {
        r.event_type: r
        for r in QUERIES["q_clickhouse_combinators_parity"].build(
            spark, str(tmp_path)
        ).collect()
    }
    v = out["view"]
    assert (v.n_rows, v.count_if_high, v.sum_if_high_milli) == (3, 2, 130000)
    assert v.avg_if_high_milli == 65000.0
    assert v.uniq_if_high_users == 2
    assert v.max_if_low_milli == 10000
    assert v.min_if_high_milli == 60000
    c = out["click"]
    assert (c.count_if_high, c.sum_if_high_milli) == (0, 0)
    assert c.min_if_high_milli is None
    assert c.max_if_low_milli == 5000


def test_linreg_recovers_exact_line(spark, tmp_path):
    """Orders priced exactly on y = 2000*x + 5000 milli (x = days since
    1992-01-01) regress to slope 2000, intercept 5000 in every
    segment — and a constant-y segment regresses to slope 0."""
    custs = [(1, "c1", 0, 0.0, "BUILDING"), (2, "c2", 0, 0.0, "AUTO")]
    orders = []
    for i, day in enumerate([10, 20, 30, 40]):
        # y_milli = 2000*day + 5000 -> price = 2*day + 5 dollars
        orders.append((i, 1, "O", 2.0 * day + 5.0,
                       dt.datetime(1992, 1, 1) + dt.timedelta(days=day),
                       "1-URGENT"))
    for i, day in enumerate([5, 15, 25]):
        orders.append((100 + i, 2, "O", 7.0,
                       dt.datetime(1992, 1, 1) + dt.timedelta(days=day),
                       "1-URGENT"))
    spark.createDataFrame(
        custs,
        ["c_custkey", "c_name", "c_nationkey", "c_acctbal", "c_mktsegment"],
    ).write.mode("overwrite").parquet(str(tmp_path / "customer.parquet"))
    spark.createDataFrame(
        orders,
        ["o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice",
         "o_orderdate", "o_orderpriority"],
    ).write.mode("overwrite").parquet(str(tmp_path / "orders.parquet"))
    out = {
        r.segment: r
        for r in QUERIES["q_simple_linreg_by_segment"].build(
            spark, str(tmp_path)
        ).collect()
    }
    b = out["BUILDING"]
    assert b.n_orders == 4
    assert b.slope_milli_per_day == 2000.0
    assert b.intercept_milli == 5000.0
    a = out["AUTO"]
    assert a.slope_milli_per_day == 0.0
    assert a.intercept_milli == 7000.0


def test_hot_key_skew_formulas(spark, tmp_path):
    """Skew ratio and salt come out of the exact integer formulas; the
    hottest key breaks ties to the smallest user_id."""
    rows = []
    eid = 0
    for _ in range(10):  # user 8 (shard 0): 10 changes
        rows.append((8, T0, (eid := eid + 1), "view", 1.0))
    for _ in range(2):   # user 16 (shard 0): 2 changes
        rows.append((16, T0, (eid := eid + 1), "view", 1.0))
    for _ in range(3):   # user 3 (shard 3): 3 changes
        rows.append((3, T0, (eid := eid + 1), "view", 1.0))
    for _ in range(3):   # user 11 (shard 3): 3 changes (tie with user 3)
        rows.append((11, T0, (eid := eid + 1), "view", 1.0))
    _events(spark, rows, tmp_path)
    out = {
        r.shard: r
        for r in QUERIES["cdc_hot_key_skew_report"].build(
            spark, str(tmp_path)
        ).collect()
    }
    s0 = out[0]
    assert (s0.n_changes, s0.n_keys, s0.max_key_changes) == (12, 2, 10)
    assert s0.hot_key == 8
    assert s0.skew_ratio_milli == (1000 * 10 * 2) // 12  # 1666
    assert s0.recommended_salt == 1  # ceil(20/48) = 1
    s3 = out[3]
    assert s3.max_key_changes == 3 and s3.hot_key == 3  # tie -> min uid
    assert s3.skew_ratio_milli == 1000  # perfectly uniform


def test_backfill_chunks_partition_keyspace(spark, tmp_path):
    """Chunks are contiguous, non-overlapping, cover every key exactly
    once, and are row-balanced (32 unique keys -> 16 chunks of 2)."""
    rows = [(i % 7, T0, 1000 + i, "view", 1.0) for i in range(32)]
    _events(spark, rows, tmp_path)
    out = sorted(
        QUERIES["cdc_backfill_chunk_plan"].build(
            spark, str(tmp_path)
        ).collect(),
        key=lambda r: r.chunk_id,
    )
    assert len(out) == 16
    assert all(r.n_rows == 2 for r in out)
    assert sum(r.n_rows for r in out) == 32
    assert out[0].key_lo == 1000 and out[-1].key_hi == 1031
    for a, b in zip(out, out[1:]):
        assert a.key_hi < b.key_lo  # contiguous, never overlapping


def test_tombstone_gc_states_partition_keys(spark, tmp_path):
    """States partition the keyspace: resurrected == deleted-then-
    reinserted keys; gc_eligible + retained_recent == final deletes;
    bytes reclaim only on gc_eligible rows."""
    n = 200
    rows = [(i % 9, T0, i, "view", 1.0) for i in range(n)]
    _events(spark, rows, tmp_path)
    out = QUERIES["cdc_tombstone_gc_plan"].build(
        spark, str(tmp_path)
    ).collect()
    by_state = {}
    for r in out:
        s = by_state.setdefault(r.state, [0, 0, 0])
        s[0] += r.n_keys
        s[1] += r.n_versions
        s[2] += r.reclaim_bytes
    deleted = {i for i in range(n) if i % 20 == 7}
    resurrected = {i for i in range(n) if i % 40 == 27}
    assert by_state["resurrected"][0] == len(resurrected)
    finals = len(deleted) - len(resurrected)
    assert (by_state["gc_eligible"][0]
            + by_state.get("retained_recent", [0])[0]) == finals
    assert by_state["alive"][0] == n - len(deleted)
    assert sum(s[0] for s in by_state.values()) == n
    assert by_state["gc_eligible"][2] > 0
    assert by_state["alive"][2] == 0 and by_state["resurrected"][2] == 0


def test_concat_chunk_split_accounting(spark, tmp_path):
    """Hand-built sources: a doc crossing the 2048 cut is split, docs
    fully inside a window are not, and a doc longer than the window is
    always split; chunk counts are exact ceilings."""
    def doc(did, n_tokens, source):
        return (did, " ".join(["w"] * n_tokens), "en", source,
                2 * n_tokens - 1)

    rows = [
        doc(1, 2000, "a"),   # [0, 2000)       -> inside chunk 0
        doc(2, 100, "a"),    # [2000, 2100)    -> crosses 2048: split
        doc(3, 48, "a"),     # [2100, 2148)    -> inside chunk 1
        doc(4, 4096, "b"),   # [0, 4096)       -> longer than window: split
    ]
    spark.createDataFrame(
        rows, ["doc_id", "text", "lang", "source", "n_chars"]
    ).write.mode("overwrite").parquet(str(tmp_path / "documents.parquet"))
    out = {
        r.source: r
        for r in QUERIES["curation_concat_chunk_census"].build(
            spark, str(tmp_path)
        ).collect()
    }
    a = out["a"]
    assert (a.n_docs, a.total_tokens, a.n_chunks) == (3, 2148, 2)
    assert a.n_docs_split == 1
    assert a.pct_split_milli == 333
    b = out["b"]
    assert (b.n_docs, b.total_tokens, b.n_chunks) == (1, 4096, 2)
    assert b.n_docs_split == 1 and b.pct_split_milli == 1000


def _docs(spark, rows, path):
    """rows: (doc_id, text, lang, source, n_chars)."""
    spark.createDataFrame(
        rows, ["doc_id", "text", "lang", "source", "n_chars"]
    ).write.mode("overwrite").parquet(str(path / "documents.parquet"))


def test_boilerplate_census_thresholds(spark, tmp_path):
    """Header/footer chrome (every doc) is boilerplate; a content line
    shared by 2 of 5 docs (40% < 50%) is NOT; one shared by 3 of 5
    (60%) IS — both df>=2 and the 50% gate must hold."""
    shared_majority = " ".join(["maj"] * 12)   # in docs 1,2,3 (60%)
    shared_minority = " ".join(["min"] * 12)   # in docs 4,5 (40%)
    rows = [
        (1, shared_majority, "en", "s", 1),
        (2, shared_majority, "en", "s", 1),
        (3, shared_majority, "en", "s", 1),
        (4, shared_minority, "en", "s", 1),
        (5, shared_minority, "en", "s", 1),
    ]
    _docs(spark, rows, tmp_path)
    out = {
        r.source: r
        for r in QUERIES["text_boilerplate_line_census"].build(
            spark, str(tmp_path)
        ).collect()
    }
    s = out["s"]
    # 5 headers + 5 content + 5 footers
    assert s.n_lines_total == 15
    # distinct: header, footer, maj-line, min-line
    assert s.n_distinct_lines == 4
    # boilerplate: header (5/5), footer (5/5), maj (3/5) — not min (2/5)
    assert s.n_boilerplate_lines == 3
    # tokens: header 4*5, footer 5*5, maj 12*3 = 81 of 105 total
    assert s.boilerplate_tokens == 20 + 25 + 36
    assert s.boilerplate_share_milli == (1000 * 81) // 105


def test_code_detection_separates_classes(spark, tmp_path):
    """The symbol-density score flags the generated snippet docs
    (doc_id % 7 == 3) and nothing else on symbol-free prose; token
    routing splits exactly."""
    rows = [
        (3, "plain words only here", "en", "s", 1),   # swapped for code
        (10, "plain words only here", "en", "s", 1),  # 10 % 7 = 3: code
        (1, "plain words only here", "en", "s", 1),
        (2, " ".join(["w"] * 50), "en", "s", 1),
    ]
    _docs(spark, rows, tmp_path)
    out = {
        r.source: r
        for r in QUERIES["text_code_detection"].build(
            spark, str(tmp_path)
        ).collect()
    }
    s = out["s"]
    assert (s.n_docs, s.n_code_docs) == (4, 2)
    assert s.code_share_milli == 500
    assert s.prose_tokens == 4 + 50
    assert s.max_score_milli >= 200
    # prose docs score exactly zero symbols -> all code tokens come
    # from the generated snippets
    assert s.code_tokens > 0


def test_array_hof_semantics(spark, tmp_path):
    """Filter/map/zip-with ascents/CSV lanes on a hand-built sequence;
    the (ts, event_id) tiebreak orders the array."""
    rows = [
        # user 1 ordered values: 70, 7, 14, 63 (ids tiebreak equal ts)
        (1, T0, 1, "view", 0.070),
        (1, T0, 2, "view", 0.007),
        (1, T0.replace(minute=1), 3, "view", 0.014),
        (1, T0.replace(minute=2), 4, "view", 0.063),
    ]
    _events(spark, rows, tmp_path)
    out = {
        r.user_id: r
        for r in QUERIES["q_array_hof_parity"].build(
            spark, str(tmp_path)
        ).collect()
    }
    u = out[1]
    assert u.n == 4
    assert u.n_high == 0  # all < 50000 milli
    assert u.mapped_sum == (141 + 15 + 29 + 127)
    assert u.n_ascents == 2  # 7->14, 14->63
    assert u.sevens_csv == "70,7,14,63"  # all multiples of 7


def test_int8_ranking_shift_flip_detected(spark, tmp_path):
    """A crafted quantization collision: two candidates whose int8
    codes tie (id decides) while milli codes order them oppositely —
    the audit must report the rank-1 flip; a numpy reimplementation
    cross-checks every row."""
    import numpy as np

    def v(*xs):
        return [float(x) for x in xs]

    rows = [
        (0, v(1.0, 0.0), 0),      # the query (0 % 100 == 0)
        (1, v(0.8, 0.6), 1),      # int8 [127, 95]  milli 800
        (2, v(0.9, 0.1), 2),      # int8 [127, 14]  milli 900
        (3, v(0.5, 0.5), 3),      # int8 [127, 127] milli 500
        (4, v(-0.2, 0.1), 4),
        (5, v(0.05, 0.9), 5),
        (6, v(0.3, -0.3), 6),
    ]
    import pyspark.sql.types as T
    schema = T.StructType([
        T.StructField("vec_id", T.LongType()),
        T.StructField("embedding", T.ArrayType(T.FloatType())),
        T.StructField("label", T.IntegerType()),
    ])
    spark.createDataFrame(rows, schema).write.mode("overwrite").parquet(
        str(tmp_path / "embeddings.parquet"))
    out = {r.query_id: r
           for r in QUERIES["embed_int8_ranking_shift"].build(
               spark, str(tmp_path)).collect()}
    assert set(out) == {0}

    # independent reference: float32 ingestion, both integer lanes
    def lanes(x):
        x = np.asarray(x, dtype=np.float32).astype(np.float64)
        vabs = np.abs(x).max()
        c8 = (np.clip(np.floor(x * 127.0 / vabs), -127, 127).astype(int)
              if vabs else np.zeros(len(x), int))
        return c8, np.floor(x * 1000.0).astype(int)

    q8, qm = lanes(rows[0][1])
    scored = []
    for vid, emb, _ in rows[1:]:
        c8, cm = lanes(emb)
        scored.append((vid, int(q8 @ c8), int(qm @ cm)))
    top8 = [t[0] for t in sorted(scored, key=lambda t: (-t[1], t[0]))][:5]
    topm = [t[0] for t in sorted(scored, key=lambda t: (-t[2], t[0]))][:5]
    r = out[0]
    assert r.n_overlap == len(set(top8) & set(topm))
    assert r.top1_agree == int(top8[0] == topm[0])
    # the construction actually flips rank 1: int8 ties 1 and 2 at 127
    # (id 1 wins), milli puts 2 (900) over 1 (800)
    assert top8[0] == 1 and topm[0] == 2 and r.top1_agree == 0


def test_language_gini_extremes(spark, tmp_path):
    """Perfect equality gives Gini 0; extreme concentration approaches
    (n-1)/n; top-language share is exact milli."""
    rows = [
        # source 'eq': two langs, 100 tokens each -> gini 0
        (1, " ".join(["w"] * 100), "en", "eq", 1),
        (2, " ".join(["w"] * 100), "fr", "eq", 1),
        # source 'skew': 990 vs 10 -> G = (2*1-2-1)*10+(2*2-2-1)*990
        #                              = -10+990 = 980; /(2*1000) = .49
        (3, " ".join(["w"] * 990), "en", "skew", 1),
        (4, " ".join(["w"] * 10), "fr", "skew", 1),
    ]
    _docs(spark, rows, tmp_path)
    out = {
        r.source: r
        for r in QUERIES["curation_language_gini"].build(
            spark, str(tmp_path)
        ).collect()
    }
    eq = out["eq"]
    assert (eq.n_langs, eq.total_tokens, eq.gini_milli) == (2, 200, 0)
    sk = out["skew"]
    assert sk.gini_milli == 490
    assert sk.top_lang == "en"
    assert sk.top_lang_share_milli == 990


def test_cooccurrence_lift_independence(spark, tmp_path):
    """Types present in every user's history have lift exactly 1;
    mutually exclusive types never emit a pair row; a type pair
    confined to the same users gets lift = nu / n_both."""
    rows = []
    eid = 0
    for u in (1, 2, 3, 4):
        rows.append((u, T0, (eid := eid + 1), "view", 1.0))
        rows.append((u, T0, (eid := eid + 1), "click", 1.0))
    # 'error' only for users 1,2 ; 'signup' only for users 3,4
    for u in (1, 2):
        rows.append((u, T0, (eid := eid + 1), "error", 1.0))
    for u in (3, 4):
        rows.append((u, T0, (eid := eid + 1), "signup", 1.0))
    _events(spark, rows, tmp_path)
    out = {
        (r.type_a, r.type_b): r
        for r in QUERIES["q_event_cooccurrence_lift"].build(
            spark, str(tmp_path)
        ).collect()
    }
    cv = out[("click", "view")]
    assert cv.n_both == 4 and cv.lift == 1.0
    assert ("error", "signup") not in out  # never co-occur
    ce = out[("click", "error")]
    assert ce.n_both == 2 and ce.n_a == 4 and ce.n_b == 2
    assert ce.lift == 1.0  # 2*4/(4*2)
    assert ce.confidence_a_to_b == 0.5

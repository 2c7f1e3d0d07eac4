"""Sessionization + scaler edge tests."""

import datetime as dt

from pyspark.sql import functions as F


def _turns(spark, rows):
    return spark.createDataFrame(
        rows, "conv_id string, turn_idx int, ts timestamp"
    )


def test_sessionize_gap_boundaries(spark):
    from ml4logs_spark.operators import windows

    t0 = dt.datetime(2024, 1, 1)
    rows = [
        ("c1", 0, t0),
        ("c1", 1, t0 + dt.timedelta(seconds=10)),
        ("c1", 2, t0 + dt.timedelta(seconds=5000)),   # > 1h gap -> new session
        ("c1", 3, t0 + dt.timedelta(seconds=5030)),
        ("c2", 0, t0),                                 # other conv independent
    ]
    out = (
        windows.with_sessions(_turns(spark, rows), gap_seconds=3600)
        .select("conv_id", "turn_idx", "session_idx").toPandas()
        .sort_values(["conv_id", "turn_idx"])
    )
    assert out[out.conv_id == "c1"].session_idx.tolist() == [0, 0, 1, 1]
    assert out[out.conv_id == "c2"].session_idx.tolist() == [0]


def test_session_stats_duration(spark):
    from ml4logs_spark.operators import windows

    t0 = dt.datetime(2024, 1, 1)
    rows = [
        ("c1", 0, t0),
        ("c1", 1, t0 + dt.timedelta(seconds=60)),
        ("c1", 2, t0 + dt.timedelta(seconds=9000)),
    ]
    s = windows.session_stats(_turns(spark, rows), gap_seconds=3600).toPandas()
    s = s.sort_values("session_idx")
    assert s.n_turns.tolist() == [2, 1]
    assert s.duration_s.tolist() == [60.0, 0.0]


def test_standardize_degenerate_and_split(spark):
    from ml4logs_spark.operators import features as feat

    # conv-a (md5 '9') is train; conv-d ('e') apply-only
    df = spark.createDataFrame(
        [("conv-a", 2.0), ("conv-a", 4.0), ("conv-d", 100.0)],
        "conv_id string, v double",
    )
    out = feat.standardize(df, "v", keys=[]).toPandas().sort_values("v")
    # mu=3, sd=sqrt(2) from train only; apply row z-scored with train stats
    import math
    assert abs(out.v_z.tolist()[0] - (2 - 3) / math.sqrt(2)) < 1e-9
    assert abs(out.v_z.tolist()[2] - (100 - 3) / math.sqrt(2)) < 1e-9

    # all-train constant column -> sd 0 -> z 0, not NaN
    c = spark.createDataFrame([("conv-a", 5.0), ("conv-b", 5.0)], "conv_id string, v double")
    z = feat.standardize(c, "v", keys=[]).toPandas()
    assert (z.v_z == 0.0).all()


def _rt(spark, rows):
    return spark.createDataFrame(
        rows, "conv_id string, turn_idx int, role string, text string, tool string"
    )


def test_conv_loop_flags_runs_and_flag(spark):
    from ml4logs_spark.operators import windows

    rows = [
        # c1: assistant/search x3 consecutive -> loop
        ("c1", 0, "user", "q", None),
        ("c1", 1, "assistant", "a", "search"),
        ("c1", 2, "assistant", "b", "search"),
        ("c1", 3, "assistant", "c", "search"),
        ("c1", 4, "user", "d", None),
        # c2: alternating -> max run 1, 4 runs
        ("c2", 0, "user", "q", None),
        ("c2", 1, "assistant", "a", "code"),
        ("c2", 2, "user", "r", None),
        ("c2", 3, "assistant", "b", "search"),
        # c3: same role, DIFFERENT tool -> runs break on tool
        ("c3", 0, "assistant", "a", "search"),
        ("c3", 1, "assistant", "b", "code"),
        ("c3", 2, "assistant", "c", "code"),
    ]
    out = {
        r["conv_id"]: r
        for r in windows.conv_loop_flags(_rt(spark, rows)).collect()
    }
    assert (out["c1"]["n_turns"], out["c1"]["n_runs"], out["c1"]["max_run"]) == (5, 3, 3)
    assert out["c1"]["loop_flag"] is True
    assert (out["c2"]["n_runs"], out["c2"]["max_run"]) == (4, 1)
    assert out["c2"]["loop_flag"] is False
    assert (out["c3"]["n_runs"], out["c3"]["max_run"]) == (2, 2)
    assert out["c3"]["loop_flag"] is False
    # min_run is a parameter
    out2 = {
        r["conv_id"]: r["loop_flag"]
        for r in windows.conv_loop_flags(_rt(spark, rows), min_run=2).collect()
    }
    assert out2 == {"c1": True, "c2": False, "c3": True}


def test_role_transition_counts(spark):
    from ml4logs_spark.operators import windows

    rows = [
        ("c1", 0, "user", "q", None),
        ("c1", 1, "assistant", "a", None),
        ("c1", 2, "user", "r", None),
        ("c2", 0, "user", "q", None),
        ("c2", 1, "assistant", "a", None),
    ]
    got = {
        (r["role_a"], r["role_b"]): r["n"]
        for r in windows.role_transition_counts(_rt(spark, rows)).collect()
    }
    # last turn of each conv contributes nothing; no cross-conv pairs
    assert got == {("user", "assistant"): 2, ("assistant", "user"): 1}


def test_conv_near_dups_and_jaccard_pairs(spark):
    from ml4logs_spark.operators import dedup

    base = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    toks = base.split()
    rows = []
    # c1 and c2: identical but one appended token on the last turn
    for cid, tail in [("c1", ""), ("c2", " extra")]:
        for i in range(4):
            rows.append((cid, i, "user", " ".join(toks[i:]) , None))
        rows[-1] = (cid, 3, "user", " ".join(toks[3:]) + tail, None)
    # c3: disjoint vocabulary
    for i in range(4):
        rows.append(("c3", i, "user", f"omega{i} psi{i} chi{i} phi{i}", None))
    turns = _rt(spark, rows)
    pairs = dedup.conv_near_dups(turns, threshold=0.8).collect()
    assert [(p["conv_a"], p["conv_b"]) for p in pairs] == [("c1", "c2")]
    assert pairs[0]["jaccard"] >= 0.8
    # unthresholded surface returns the same verified pair values
    jp = {
        (r["conv_a"], r["conv_b"]): r["jaccard"]
        for r in dedup.conv_jaccard_pairs(turns).collect()
    }
    assert jp[("c1", "c2")] == pairs[0]["jaccard"]
    assert all(a != "c3" and b != "c3" or j < 0.8 for (a, b), j in jp.items())


def _full_turns(spark, rows):
    return spark.createDataFrame(
        rows,
        "conv_id string, turn_idx int, role string, text string, "
        "tool string, ts timestamp",
    )


def test_dedup_consecutive_turns(spark):
    """Exact-consecutive repeats drop (NULL-safe on tool/text), A B A
    keeps all three, first turns always survive — even an all-NULL
    first turn — and conversations are independent."""
    import datetime as dt

    from ml4logs_spark.operators import windows

    t0 = dt.datetime(2024, 1, 1)
    rows = [
        ("c1", 0, "user", "hi", None, t0),
        ("c1", 1, "user", "hi", None, t0),          # dup of 0 -> drop
        ("c1", 2, "assistant", "hello", "search", t0),
        ("c1", 3, "user", "hi", None, t0),          # A B A -> keep
        ("c2", 0, "user", "hi", None, t0),          # conv boundary
        ("c3", 0, None, None, None, t0),            # all-NULL first turn
        ("c3", 1, None, None, None, t0),            # real NULL dup -> drop
    ]
    got = sorted(
        (r.conv_id, r.turn_idx)
        for r in windows.dedup_consecutive_turns(
            _full_turns(spark, rows)
        ).collect()
    )
    assert got == [("c1", 0), ("c1", 2), ("c1", 3), ("c2", 0), ("c3", 0)]


def test_pack_conversations_hand_computed(spark):
    """Offsets follow conv_id order, NULL text counts 0 tokens, and a
    conversation straddling the budget belongs to the sequence where
    its first token lands."""
    import datetime as dt

    from ml4logs_spark.operators import windows

    t0 = dt.datetime(2024, 1, 1)
    rows = [
        ("a", 0, "user", "one two three", None, t0),   # 3 tokens
        ("a", 1, "user", "four five", None, t0),       # conv a: 5 tokens
        ("b", 0, "user", None, None, t0),               # conv b: 0 tokens
        ("c", 0, "user", "x y z w", None, t0),          # conv c: 4 tokens
        ("d", 0, "user", "tail", None, t0),             # conv d: 1 token
    ]
    got = {
        r.conv_id: (r.conv_tokens, r.token_offset, r.seq_id, r.seq_pos)
        for r in windows.pack_conversations(
            _full_turns(spark, rows), seq_tokens=6
        ).collect()
    }
    assert got == {
        "a": (5, 0, 0, 0),
        "b": (0, 5, 0, 5),
        "c": (4, 5, 0, 5),   # first token in seq 0 though it straddles
        "d": (1, 9, 1, 3),
    }


def test_pack_conversations_partition_invariant(spark):
    """Same packing at 1 / 3 / 16 range partitions (two-phase shape)."""
    import datetime as dt

    from ml4logs_spark.operators import windows

    t0 = dt.datetime(2024, 1, 1)
    rows = [
        (f"c{i:03d}", j, "user", " ".join(["tok"] * ((i * 7 + j) % 5)),
         None, t0)
        for i in range(40) for j in range(3)
    ]
    frames = [
        {
            (r.conv_id, r.conv_tokens, r.token_offset, r.seq_id, r.seq_pos)
            for r in windows.pack_conversations(
                _full_turns(spark, rows), seq_tokens=16, n_parts=p
            ).collect()
        }
        for p in (1, 3, 16)
    ]
    assert frames[0] == frames[1] == frames[2]


def test_conv_quality_flags_hand_computed(spark):
    """Each SFT-gate rule fires on its planted conversation; the
    healthy conversation passes everything."""
    from ml4logs_spark.operators import windows

    rows = [
        # c1: healthy user/assistant alternation
        ("c1", 0, "user", "q", None),
        ("c1", 1, "assistant", "a", "code"),
        ("c1", 2, "user", "r", None),
        ("c1", 3, "assistant", "b", None),
        # c2: assistant monologue, opens with assistant, no user
        ("c2", 0, "assistant", "a", None),
        ("c2", 1, "assistant", "b", None),
        ("c2", 2, "assistant", "c", None),
        # c3: single turn
        ("c3", 0, "user", "q", None),
        # c4: tool spam (3 of 4 turns are tool)
        ("c4", 0, "user", "q", None),
        ("c4", 1, "tool", "x", "search"),
        ("c4", 2, "tool", "y", "search"),
        ("c4", 3, "tool", "z", "search"),
    ]
    out = {
        r["conv_id"]: r.asDict()
        for r in windows.conv_quality_flags(
            _rt(spark, rows),
            min_turns=2,
            max_turns=10,
            max_role_run=2,
            min_user_frac=0.25,
            max_tool_frac=0.25,
        ).collect()
    }
    c1 = out["c1"]
    assert (c1["n_turns"], c1["max_role_run"]) == (4, 1)
    assert c1["user_frac"] == 0.5 and c1["tool_frac"] == 0.0
    assert c1["opening_role"] == "user" and c1["passes"]

    c2 = out["c2"]
    assert c2["max_role_run"] == 3 and not c2["pass_role_run"]
    assert c2["user_frac"] == 0.0 and not c2["pass_user_frac"]
    assert c2["opening_role"] == "assistant" and not c2["pass_opening"]
    assert not c2["passes"]

    c3 = out["c3"]
    assert not c3["pass_turn_count"] and not c3["passes"]
    # single user turn still satisfies the other rules
    assert c3["pass_user_frac"] and c3["pass_opening"]

    c4 = out["c4"]
    assert c4["tool_frac"] == 0.75 and not c4["pass_tool_frac"]
    assert c4["max_role_run"] == 3 and not c4["pass_role_run"]
    assert not c4["passes"]


def test_curate_transcripts_chain_hand_computed(spark):
    """Every stage of the transcript curation chain fires on its
    planted conversation: exact dedup keeps the lower conv_id, the
    stutter strip runs BEFORE the gate (so a cleaned conversation
    passes max_role_run it would raw-fail), the gate drops the
    assistant monologue, and packing offsets accumulate in conv_id
    order over survivors only."""
    from ml4logs_spark import cache
    from ml4logs_spark.operators import curate

    rows = [
        # c1: healthy, 2 turns, 2+2=4 tokens
        ("c1", 0, "user", "hello there", None),
        ("c1", 1, "assistant", "hi friend", None),
        # c2: exact duplicate of c1 (same ordered texts) -> dropped
        ("c2", 0, "user", "hello there", None),
        ("c2", 1, "assistant", "hi friend", None),
        # c3: assistant double-submit: raw max_role_run=3 would fail
        # the gate at max_role_run=2, but the stutter strip collapses
        # the repeat first -> survives with 3 turns, 1+1+2=4 tokens
        ("c3", 0, "user", "question", None),
        ("c3", 1, "assistant", "answer", None),
        ("c3", 2, "assistant", "answer", None),
        ("c3", 3, "assistant", "more detail", None),
        # c4: assistant monologue, opens wrong, no user -> gated out
        ("c4", 0, "assistant", "a", None),
        ("c4", 1, "assistant", "b", None),
    ]
    cache.release_all()
    out = (
        curate.curate_transcripts(
            _rt(spark, rows),
            min_turns=2,
            max_turns=10,
            max_role_run=2,
            min_user_frac=0.25,
            max_tool_frac=0.5,
            seq_tokens=5,
        )
        .toPandas()
        .sort_values(["conv_id", "turn_idx"])
        .reset_index(drop=True)
    )
    cache.release_all()
    assert sorted(out.conv_id.unique()) == ["c1", "c3"]
    # c3's stuttered turn_idx=2 is stripped; the others survive
    assert out[out.conv_id == "c3"].turn_idx.tolist() == [0, 1, 3]
    # packing: c1 at offset 0 (4 tokens), c3 starts at 4 -> seq_id 0
    # under seq_tokens=5 (first token lands at pos 4)
    c1 = out[out.conv_id == "c1"].iloc[0]
    c3 = out[out.conv_id == "c3"].iloc[0]
    assert (c1.conv_tokens, c1.token_offset, c1.seq_id, c1.seq_pos) == (4, 0, 0, 0)
    assert (c3.conv_tokens, c3.token_offset, c3.seq_id, c3.seq_pos) == (4, 4, 0, 4)


def test_curate_transcripts_attrition_matches_composition(spark):
    """The attrition report's stage counts equal the independently
    composed operators (dedup -> stutter strip -> gate), on a fixture
    where every stage drops something."""
    from ml4logs_spark import cache
    from ml4logs_spark.operators import curate, dedup, windows

    rows = [
        ("c1", 0, "user", "hello there", None),
        ("c1", 1, "assistant", "hi friend", None),
        ("c2", 0, "user", "hello there", None),    # dup of c1
        ("c2", 1, "assistant", "hi friend", None),
        ("c3", 0, "user", "question", None),
        ("c3", 1, "assistant", "answer", None),
        ("c3", 2, "assistant", "answer", None),    # stutter row
        ("c3", 3, "assistant", "more detail", None),
        ("c4", 0, "assistant", "a", None),          # gated out
        ("c4", 1, "assistant", "b", None),
    ]
    kw = dict(min_turns=2, max_turns=10, max_role_run=2,
              min_user_frac=0.25, max_tool_frac=0.5)
    t = _rt(spark, rows)
    got = {
        r["stage"]: (r["n_convs"], r["n_turns"])
        for r in curate.curate_transcripts_attrition(t, **kw).collect()
    }
    surv = dedup.conv_dedup_survivors(t)
    clean = windows.dedup_consecutive_turns(surv)
    gate = windows.conv_quality_flags(clean, **kw).filter("passes")
    kept = clean.join(gate.select("conv_id"), "conv_id", "left_semi")
    assert got["raw"] == (t.select("conv_id").distinct().count(), t.count())
    assert got["exact_dedup"] == (
        surv.select("conv_id").distinct().count(), surv.count())
    assert got["stutter_strip"][1] == clean.count()
    assert got["quality_gate"] == (
        kept.select("conv_id").distinct().count(), kept.count())
    # expected absolute values: c2 deduped, c3 loses a stutter turn,
    # c4 gated out
    assert got["raw"] == (4, 10)
    assert got["exact_dedup"] == (3, 8)
    assert got["stutter_strip"] == (3, 7)
    assert got["quality_gate"] == (2, 5)
    cache.release_all()


def test_curate_transcripts_branch_stage_is_composition(spark):
    """branch_min_shared == applying conv_branch_survivors after exact
    dedup: the retry stub (a proper prefix of a surviving longer
    branch) is pruned by the chain, and the chain with the stage off
    keeps it."""
    from ml4logs_spark import cache
    from ml4logs_spark.operators import curate, dedup

    rows = [
        ("long1", 0, "user", "open the file", None),
        ("long1", 1, "assistant", "file opened fine", None),
        ("long1", 2, "user", "now close it", None),
        ("long1", 3, "assistant", "closed it now", None),
        # retry stub: proper prefix of long1 -> pruned by the stage
        ("stub1", 0, "user", "open the file", None),
        ("stub1", 1, "assistant", "file opened fine", None),
        # unrelated healthy conversation
        ("solo1", 0, "user", "ping the host", None),
        ("solo1", 1, "assistant", "pong came back", None),
    ]
    t = spark.createDataFrame(
        [(c, i, r, x, tl, None) for c, i, r, x, tl in rows],
        "conv_id string, turn_idx int, role string, text string, "
        "tool string, ts timestamp",
    )
    kw = dict(min_turns=2, max_turns=10, max_role_run=3,
              min_user_frac=0.1, max_tool_frac=0.9)
    cache.release_all()
    with_stage = curate.curate_transcripts(t, branch_min_shared=1, **kw)
    got = {(r.conv_id, r.turn_idx) for r in with_stage.collect()}
    cache.release_all()
    composed = curate.curate_transcripts(
        dedup.conv_branch_survivors(dedup.conv_dedup_survivors(t)), **kw
    )
    want = {(r.conv_id, r.turn_idx) for r in composed.collect()}
    cache.release_all()
    assert got == want
    assert {c for c, _ in got} == {"long1", "solo1"}

    cache.release_all()
    no_stage = curate.curate_transcripts(t, **kw)
    assert {r.conv_id for r in no_stage.collect()} == {"long1", "stub1", "solo1"}
    cache.release_all()


def test_tool_latency_stats_hand_computed(spark):
    """Latency = next turn's ts minus the tool turn's ts, measured over
    the FULL stream (the next turn need not be a tool turn); a
    conversation-final tool call counts in n_calls but not n_timed;
    the average is exact integer division."""
    from datetime import datetime as dt

    from ml4logs_spark.operators import windows

    rows = [
        ("c1", 0, "user", "q", None, dt(2024, 3, 1, 0, 0, 0)),
        ("c1", 1, "tool", "r", "tool_1", dt(2024, 3, 1, 0, 0, 1)),
        ("c1", 2, "assistant", "a", None, dt(2024, 3, 1, 0, 0, 4)),
        ("c2", 0, "tool", "r", "tool_1", dt(2024, 3, 1, 0, 0, 0)),
        ("c2", 1, "tool", "r", "tool_2", dt(2024, 3, 1, 0, 0, 2)),
        # conversation-final tool call: no successor
        ("c3", 0, "tool", "r", "tool_2", dt(2024, 3, 1, 0, 0, 0)),
    ]
    t = spark.createDataFrame(
        rows,
        "conv_id string, turn_idx int, role string, text string, "
        "tool string, ts timestamp",
    )
    out = {r.tool: r.asDict() for r in windows.tool_latency_stats(t).collect()}
    # tool_1: c1 latency 3s, c2 latency 2s -> avg (5s div 2) = 2.5s -> 2_500_000
    assert out["tool_1"] == {
        "tool": "tool_1", "n_calls": 2, "n_timed": 2,
        "total_latency_us": 5_000_000, "avg_latency_us": 2_500_000,
        "max_latency_us": 3_000_000,
    }
    # tool_2: one untimed final call + none timed in c2? c2 turn1 is final too
    assert out["tool_2"] == {
        "tool": "tool_2", "n_calls": 2, "n_timed": 0,
        "total_latency_us": 0, "avg_latency_us": None,
        "max_latency_us": None,
    }


def test_daily_health_state_merge_equals_batch(spark):
    """Publishing from a merged per-(day, conv) state == the direct
    rollup over the union, including a conversation spanning days and
    a conversation split ACROSS the two batches on the same day (the
    distinct-conv count must not double)."""
    from datetime import datetime as dt

    from ml4logs_spark.operators import windows

    def row(c, i, txt, tl, d, h):
        return (c, i, "user", txt, tl, dt(2024, 3, d, h, 0, 0))

    a = spark.createDataFrame(
        [
            row("c1", 0, "hello", None, 1, 1),
            row("c1", 1, "error code 7 while processing x payload", None, 1, 2),
            row("c2", 0, "spans days", "tool_1", 1, 23),
            row("c2", 1, "next day", None, 2, 1),
        ],
        "conv_id string, turn_idx int, role string, text string, "
        "tool string, ts timestamp",
    )
    b = spark.createDataFrame(
        [
            # c1 continues on day 1 in the second batch: same (day, conv)
            row("c1", 2, "more on day one", "tool_2", 1, 5),
            row("c3", 0, "fresh conv", None, 2, 3),
        ],
        "conv_id string, turn_idx int, role string, text string, "
        "tool string, ts timestamp",
    )
    merged = windows.merge_daily_health_state(
        windows.daily_health_state(a), windows.daily_health_state(b)
    )
    got = {
        r.day_us: r.asDict()
        for r in windows.daily_health_from_state(merged).collect()
    }
    want = {
        r.day_us: r.asDict()
        for r in windows.daily_health_rollup(a.unionByName(b)).collect()
    }
    assert got == want
    day1 = [v for v in got.values() if v["n_turns"] == 4][0]
    assert day1["n_convs"] == 2  # c1 split across batches counts once
    assert day1["error_ppm"] == 250000


def test_tool_latency_percentiles_hand_computed(spark):
    """Type-1 lower quantile at integer rank (n*p + 99) div 100: p50 of
    five latencies {1..5}s is the 3rd smallest, p95 the 5th; a
    single-call tool returns its one latency for every percentile;
    tools with only untimed (conversation-final) calls are absent."""
    from datetime import datetime as dt

    from ml4logs_spark import cache
    from ml4logs_spark.operators import windows

    rows = []
    for i, l in enumerate([1, 2, 3, 4, 5]):
        rows += [
            (f"a{i}", 0, "tool", "x", "tool_a", dt(2024, 3, 1, 0, 0, 0)),
            (f"a{i}", 1, "user", "y", None, dt(2024, 3, 1, 0, 0, l)),
        ]
    rows += [
        ("b0", 0, "tool", "x", "tool_b", dt(2024, 3, 1, 0, 0, 0)),
        ("b0", 1, "user", "y", None, dt(2024, 3, 1, 0, 0, 7)),
        ("c0", 0, "tool", "x", "tool_c", dt(2024, 3, 1, 0, 0, 0)),
    ]
    t = spark.createDataFrame(
        rows,
        "conv_id string, turn_idx int, role string, text string, "
        "tool string, ts timestamp",
    )
    cache.release_all()
    got = sorted(tuple(r) for r in windows.tool_latency_percentiles(t).collect())
    cache.release_all()
    assert got == [
        ("tool_a", 50, 5, 3_000_000),
        ("tool_a", 95, 5, 5_000_000),
        ("tool_b", 50, 1, 7_000_000),
        ("tool_b", 95, 1, 7_000_000),
    ]


def test_latency_histogram_state_and_percentiles(spark):
    """Power-of-2 buckets are integer-exact (1,2,3 -> buckets 1,2,2;
    zero latency -> bucket 0), merge is additive, and the published
    bucket is a lower bound within 2x of the exact percentile (same
    rank formula as the exact path)."""
    from datetime import datetime as dt, timedelta

    from ml4logs_spark import cache
    from ml4logs_spark.operators import windows

    def conv(cid, tool, lat_us):
        t0 = dt(2024, 3, 1)
        return [
            (cid, 0, "tool", "x", tool, t0),
            (cid, 1, "user", "y", None, t0 + timedelta(microseconds=lat_us)),
        ]

    # tool_a latencies (us): 1, 2, 3, 8, 1000 -> buckets 1, 2, 2, 8, 512
    rows = []
    for i, l in enumerate([1, 2, 3, 8, 1000]):
        rows += conv(f"a{i}", "tool_a", l)
    rows += conv("z0", "tool_z", 0)  # zero latency -> bucket 0
    t = spark.createDataFrame(
        rows,
        "conv_id string, turn_idx int, role string, text string, "
        "tool string, ts timestamp",
    )
    hist = {
        (r.tool, r.bucket_lo): r.n
        for r in windows.tool_latency_histogram_state(t).collect()
    }
    assert hist == {
        ("tool_a", 1): 1, ("tool_a", 2): 2, ("tool_a", 8): 1,
        ("tool_a", 512): 1, ("tool_z", 0): 1,
    }

    # split/merge == batch, and publish picks the rank-3 bucket for p50
    nib_a = t.filter(F.col("conv_id").startswith("a0") | F.col("conv_id").startswith("a1"))
    nib_b = t.subtract(nib_a)
    merged = windows.merge_tool_latency_histograms(
        windows.tool_latency_histogram_state(nib_a),
        windows.tool_latency_histogram_state(nib_b),
    )
    assert {
        (r.tool, r.bucket_lo): r.n for r in merged.collect()
    } == hist
    out = {
        (r.tool, r.q_pct): (r.n_timed, r.bucket_lo)
        for r in windows.latency_percentiles_from_histogram(merged).collect()
    }
    # exact p50 of {1,2,3,8,1000} = 3 -> bucket 2 (lower bound within 2x);
    # exact p95 = 1000 -> bucket 512
    assert out == {
        ("tool_a", 50): (5, 2), ("tool_a", 95): (5, 512),
        ("tool_z", 50): (1, 0), ("tool_z", 95): (1, 0),
    }
    cache.release_all()


def test_daily_health_drift_hand_computed(spark):
    """Day-over-day drift: ppm deltas are exact integers, the jump
    flag fires only on a >=50% rise (0/1 BIGINT), day one has a NULL
    baseline, and flat-zero days never flag."""
    from datetime import datetime as dt, timezone

    from ml4logs_spark.operators import windows

    rows = []

    def day(d, n, nerr, tag):
        for i in range(n):
            txt = f"error code {i}" if i < nerr else f"ok {i}"
            rows.append(
                (f"c{tag}", i, "user", txt, None, dt(2024, 3, d, 12, 0, i))
            )

    day(1, 4, 1, "a")   # 250000 ppm, no baseline
    day(2, 4, 2, "b")   # 500000 ppm: +100% -> jump
    day(3, 5, 1, "c")   # 200000 ppm: drop -> no jump
    day(4, 4, 0, "d")   # 0 ppm
    day(5, 4, 0, "e")   # flat zero -> no jump
    t = spark.createDataFrame(
        rows,
        "conv_id string, turn_idx int, role string, text string, "
        "tool string, ts timestamp",
    )
    got = {
        r.day_us: (r.n_turns, r.error_ppm, r.prev_error_ppm,
                   r.error_ppm_delta, r.error_jump)
        for r in windows.daily_health_drift(t).collect()
    }

    def us(d):
        return int(dt(2024, 3, d, tzinfo=timezone.utc).timestamp() * 1e6)

    assert got == {
        us(1): (4, 250000, None, None, 0),
        us(2): (4, 500000, 250000, 250000, 1),
        us(3): (5, 200000, 500000, -300000, 0),
        us(4): (4, 0, 200000, -200000, 0),
        us(5): (4, 0, 0, 0, 0),
    }


def test_latency_drift_from_histograms_hand_computed(spark):
    """Drift math on two hand-built states: bit-length bucket_shift
    (8 -> 32 = +2 steps, drifted), equal buckets don't flag, the zero
    bucket indexes as 0, and tools missing from either state drop
    (inner join)."""
    from ml4logs_spark.operators import windows

    schema = "tool string, bucket_lo long, n long"
    a = spark.createDataFrame(
        [("tool_a", 8, 10), ("tool_b", 0, 4), ("tool_c", 2, 1)], schema
    )
    b = spark.createDataFrame(
        [("tool_a", 32, 10), ("tool_b", 0, 7), ("tool_d", 4, 2)], schema
    )
    got = {
        (r.tool, r.q_pct): (r.bucket_lo_a, r.bucket_lo_b,
                            r.bucket_shift, r.drifted)
        for r in windows.latency_drift_from_histograms(a, b).collect()
    }
    assert got == {
        ("tool_a", 50): (8, 32, 2, 1), ("tool_a", 95): (8, 32, 2, 1),
        ("tool_b", 50): (0, 0, 0, 0), ("tool_b", 95): (0, 0, 0, 0),
    }


def test_slowest_and_first_tool_hand_computed(spark):
    """Top-k triage keeps the deterministic tie-broken k-set; the
    funnel stat is NULL for tool-free conversations and 0 when the
    first turn already calls a tool."""
    from datetime import datetime as dt, timedelta

    from ml4logs_spark.operators import windows

    t0 = dt(2024, 3, 1)

    def turn(cid, i, tool, off_us):
        return (cid, i, "u", "x", tool, t0 + timedelta(microseconds=off_us))

    rows = [
        # conv a: tool at turn 0 (latency 5), tool at turn 1 (latency 3)
        turn("a", 0, "t1", 0), turn("a", 1, "t2", 5), turn("a", 2, None, 8),
        # conv b: tie with a's slowest (latency 5) -> tie-break on conv_id
        turn("b", 0, "t1", 0), turn("b", 1, None, 5),
        # conv c: never calls a tool
        turn("c", 0, None, 0), turn("c", 1, None, 9),
        # conv d: first tool at turn 1, 7us after conv start
        turn("d", 0, None, 0), turn("d", 1, "t3", 7), turn("d", 2, None, 11),
    ]
    t = spark.createDataFrame(
        rows,
        "conv_id string, turn_idx int, role string, text string, "
        "tool string, ts timestamp",
    )
    top = [
        (r.conv_id, r.turn_idx, r.tool, r.latency_us)
        for r in windows.slowest_tool_calls(t, k=3).collect()
    ]
    assert top == [("a", 0, "t1", 5), ("b", 0, "t1", 5), ("d", 1, "t3", 4)]

    first = {
        r.conv_id: (r.n_turns, r.us_to_first_tool)
        for r in windows.time_to_first_tool(t).collect()
    }
    assert first == {
        "a": (3, 0), "b": (2, 0), "c": (2, None), "d": (3, 7),
    }


def test_tool_transitions_and_endings_hand_computed(spark):
    """Tool transitions skip intervening non-tool turns (subsequence
    pairs, not adjacent-turn pairs); the ending flag picks exactly the
    max-turn_idx row."""
    from datetime import datetime as dt, timedelta

    from ml4logs_spark.operators import windows

    t0 = dt(2024, 3, 1)
    rows = [
        # conv a: t1 -> (user) -> t2 -> t1 ; ends on an error turn
        ("a", 0, "tool", "x", "t1", t0),
        ("a", 1, "user", "y", None, t0 + timedelta(seconds=1)),
        ("a", 2, "tool", "x", "t2", t0 + timedelta(seconds=2)),
        ("a", 3, "tool", "x", "t1", t0 + timedelta(seconds=3)),
        ("a", 4, "assistant", "error code 7", None, t0 + timedelta(seconds=4)),
        # conv b: single tool call, clean ending
        ("b", 0, "tool", "x", "t1", t0),
        ("b", 1, "assistant", "done", None, t0 + timedelta(seconds=1)),
    ]
    t = spark.createDataFrame(
        rows,
        "conv_id string, turn_idx int, role string, text string, "
        "tool string, ts timestamp",
    )
    trans = {
        (r.tool_a, r.tool_b): r.n
        for r in windows.tool_transition_counts(t).collect()
    }
    assert trans == {("t1", "t2"): 1, ("t2", "t1"): 1}

    ends = {
        r.conv_id: (r.last_turn_idx, r.ends_on_error)
        for r in windows.conv_endings(t).collect()
    }
    assert ends == {"a": (4, 1), "b": (1, 0)}


def test_tool_retry_runs_hand_computed(spark):
    """Runs count consecutive same-tool calls in the tool subsequence
    (intervening non-tool turns don't break a run); min_run=2 drops
    single calls; a re-visit after a different tool starts a NEW run."""
    from datetime import datetime as dt, timedelta

    from ml4logs_spark.operators import windows

    t0 = dt(2024, 3, 1)
    rows = [
        # conv a tool seq: t1 t1 (user) t1 t2 t1 -> runs t1:3, t2:1, t1:1
        ("a", 0, "tool", "x", "t1", t0),
        ("a", 1, "tool", "x", "t1", t0 + timedelta(seconds=1)),
        ("a", 2, "user", "y", None, t0 + timedelta(seconds=2)),
        ("a", 3, "tool", "x", "t1", t0 + timedelta(seconds=3)),
        ("a", 4, "tool", "x", "t2", t0 + timedelta(seconds=4)),
        ("a", 5, "tool", "x", "t1", t0 + timedelta(seconds=5)),
        # conv b: t3 t3 -> run of 2
        ("b", 0, "tool", "x", "t3", t0),
        ("b", 1, "tool", "x", "t3", t0 + timedelta(seconds=1)),
        # conv c: single call only -> filtered by min_run
        ("c", 0, "tool", "x", "t1", t0),
    ]
    t = spark.createDataFrame(
        rows,
        "conv_id string, turn_idx int, role string, text string, "
        "tool string, ts timestamp",
    )
    got = {
        (r.conv_id, r.tool): r.max_run
        for r in windows.tool_retry_runs(t).collect()
    }
    assert got == {("a", "t1"): 3, ("b", "t3"): 2}


def test_error_attribution_and_ending_rollup_hand_computed(spark):
    """Attribution counts only the IMMEDIATE next turn (the last turn
    of a conversation attributes to nothing); the ending rollup buckets
    each conversation once, on its last turn's day."""
    from datetime import datetime as dt, timedelta

    from ml4logs_spark.operators import windows

    d1, d2 = dt(2024, 3, 1, 10), dt(2024, 3, 2, 10)
    rows = [
        # conv a (ends day 1, on an error): t1 -> error, t2 -> ok
        ("a", 0, "tool", "x", "t1", d1),
        ("a", 1, "assistant", "error code 3", None, d1 + timedelta(seconds=1)),
        ("a", 2, "tool", "x", "t2", d1 + timedelta(seconds=2)),
        ("a", 3, "assistant", "error code 9", None, d1 + timedelta(seconds=3)),
        # conv b (spans into day 2, clean ending): t1 -> ok; trailing t2
        ("b", 0, "tool", "x", "t1", d1),
        ("b", 1, "assistant", "fine", None, d1 + timedelta(seconds=1)),
        ("b", 2, "tool", "x", "t2", d2),  # last turn: attributes nothing
    ]
    t = spark.createDataFrame(
        rows,
        "conv_id string, turn_idx int, role string, text string, "
        "tool string, ts timestamp",
    )
    attr = {
        r.tool: (r.n_calls, r.n_followed_by_error, r.error_follow_ppm)
        for r in windows.tool_error_attribution(t).collect()
    }
    assert attr == {
        "t1": (2, 1, 500000),   # a:0 -> error, b:0 -> fine
        "t2": (2, 1, 500000),   # a:2 -> error, b:2 -> (nothing)
    }

    from datetime import timezone

    def us(d):
        return int(d.replace(tzinfo=timezone.utc).timestamp() * 1e6)

    roll = {
        r.day_us: (r.n_convs_ended, r.n_error_ended, r.error_end_ppm)
        for r in windows.conv_ending_rollup(t).collect()
    }
    assert roll == {
        us(dt(2024, 3, 1)): (1, 1, 1000000),  # conv a
        us(dt(2024, 3, 2)): (1, 0, 0),        # conv b
    }


def test_merge_slowest_tool_calls_equals_batch(spark, turns):
    """Top-k is mergeable: the k-set of the union of two split k-sets
    equals the batch k-set, row for row (total order breaks ties)."""
    from pyspark.sql import functions as F

    from ml4logs_spark.operators import windows

    nib = F.substring(F.md5("conv_id"), 1, 1)
    merged = windows.merge_slowest_tool_calls(
        windows.slowest_tool_calls(turns.filter(nib < F.lit("8")), k=7),
        windows.slowest_tool_calls(turns.filter(nib >= F.lit("8")), k=7),
        k=7,
    ).collect()
    batch = windows.slowest_tool_calls(turns, k=7).collect()
    key = lambda r: (-r.latency_us, r.conv_id, r.turn_idx)
    assert [key(r) for r in merged] == [key(r) for r in batch]
    assert len(batch) == 7

"""Drain miner fit/apply tests (SURVEY.md §2.10 F1).

The miner is the one custom non-relational operator; these pin (a) fit
determinism, (b) template quality on the planted grammar, (c) vectorized
apply correctness including the unseen-at-fit fixture."""

import pandas as pd

from ml4logs_spark.operators import drain


def test_miner_masks_planted_grammar():
    m = drain.DrainMiner()
    lines = [
        "svc click request 87 accepted from user 13",
        "svc click request 9 accepted from user 2",
        "svc error request 5 accepted from user 140",
        "error code 42 while processing view payload",
        "error code 7 while processing view payload",
        "heartbeat session 3 ok",
    ]
    for ln in lines:
        m.add(ln)
    templates = [t for t, _ in m.templates()]
    assert "svc click request <*> accepted from user <*>" in templates
    assert "error code <*> while processing view payload" in templates
    assert "heartbeat session <*> ok" in templates


def test_miner_merges_variable_token():
    m = drain.DrainMiner()
    m.add("tool tool_1 invoked with arg 5 by member 9")
    m.add("tool tool_3 invoked with arg 7 by member 2")
    ts = [t for t, _ in m.templates()]
    # tool_1 vs tool_3 are non-numeric differing tokens -> wildcard merge
    assert ts == ["tool <*> invoked with arg <*> by member <*>"]


def test_miner_occurrence_counts():
    m = drain.DrainMiner()
    for i in range(5):
        m.add(f"heartbeat session {i} ok")
    assert m.templates() == [("heartbeat session <*> ok", 5)]


def test_fit_deterministic(turns):
    a = drain.fit_templates(turns, sample_size=500)
    b = drain.fit_templates(turns, sample_size=500)
    assert a == b and len(a) > 0


def test_auto_pruning_same_templates(spark):
    """Default-on auto sample pruning mines the same template set as the
    unpruned fit on a corpus large enough to trigger it."""
    rows = [
        ("c%04d" % (i % 97), i, line)
        for i in range(2000)
        for line in [
            [
                f"svc click request {i} accepted from user {i % 13}",
                f"error code {i % 7} while processing view payload",
                f"heartbeat session {i} ok",
            ][i % 3]
        ]
    ]
    df = spark.createDataFrame(rows, "conv_id string, turn_idx int, text string")
    pruned = drain.fit_templates(df, sample_size=200)            # auto default
    assert drain._auto_frac_hex(df, 200) is not None             # pruning active
    full = drain.fit_templates(df, sample_size=200, sample_frac_hex=None)
    assert pruned == full and len(pruned) == 3


def test_auto_pruning_off_for_small_inputs(turns):
    # sf0.001 fixture is smaller than 4x the default sample -> no pruning
    assert drain._auto_frac_hex(turns, 50_000) is None


def test_apply_assigns_every_planted_turn(spark, turns):
    tpls = drain.fit_templates(turns, sample_size=2000)
    out = drain.match_templates(turns, tpls)
    pdf = out.select("conv_id", "turn_idx", "text", "drain_template").toPandas()
    nonempty = pdf[pdf.text != ""]
    # fit saw every template family (grammar is small) -> full coverage
    assert nonempty.drain_template.notna().all()
    # empty text stays unmatched (null), never crashes
    assert pdf[pdf.text == ""].drain_template.isna().all()


def test_apply_consistent_with_mask_parse(spark, turns):
    """Each masked template maps to exactly one mined template — the
    mined parse is a (possibly coarser) deterministic function of the
    static parse on this grammar."""
    from ml4logs_spark.functions.masking import mask_text

    tpls = drain.fit_templates(turns, sample_size=2000)
    out = drain.match_templates(turns, tpls).withColumn("mask", mask_text())
    pdf = out.select("mask", "drain_template").toPandas()
    pdf = pdf[pdf.drain_template.notna()]
    fanout = pdf.groupby("mask").drain_template.nunique()
    assert (fanout == 1).all()


def test_unseen_at_fit_maps_to_null_not_crash(spark):
    tpls = ["heartbeat session <*> ok"]
    df = spark.createDataFrame(
        [("c1", 0, "heartbeat session 9 ok"), ("c1", 1, "totally novel text 42")],
        "conv_id string, turn_idx int, text string",
    )
    out = drain.match_templates(df, tpls).toPandas().sort_values("turn_idx")
    assert out.drain_template.tolist()[0] == "heartbeat session <*> ok"
    assert pd.isna(out.drain_template.tolist()[1])


def _ref_loop_assign(templates, texts):
    """Reference per-template first-wins loop (the pre-alternation
    semantics the grouped regex must reproduce exactly)."""
    import re as _re

    compiled = [
        (t, _re.compile(drain.template_regex(t)), len(t.split()))
        for t in templates
    ]
    out = []
    for s in texts:
        hit = None
        if s:
            k = len(s.split())
            for t, rx, tk in compiled:
                if tk == k and rx.fullmatch(s):
                    hit = t
                    break
        out.append(hit)
    return out


def test_alternation_identical_to_per_template_loop(spark):
    """One alternation regex per token-count group must assign exactly
    what the per-template loop assigns — including first-template-wins
    on overlapping templates of the same length."""
    templates = [
        "alpha <*> beta gamma",
        "alpha <*> beta <*>",  # overlaps the previous on 'alpha N beta gamma'
        "<*> x y z",
        "heartbeat session <*> ok",
        "solo",
    ]
    texts = [
        "alpha 3 beta gamma",   # matches templates 0 AND 1 -> 0 wins
        "alpha 3 beta delta",   # only 1
        "q x y z",
        "heartbeat session 5 ok",
        "no match here at all",
        "solo",
        "",
    ]
    df = spark.createDataFrame(
        [("c", i, s) for i, s in enumerate(texts)],
        "conv_id string, turn_idx int, text string",
    )
    got = (
        drain.match_templates(df, templates)
        .toPandas().sort_values("turn_idx").drain_template
    )
    want = _ref_loop_assign(templates, texts)
    assert [None if pd.isna(x) else x for x in got] == want


def test_alternation_scales_to_1k_template_group(spark):
    """A mined dim of 1,000 same-length templates compiles into one
    group regex and still assigns correctly (the per-template loop
    would cost 1,000 vectorized passes per batch here; the alternation
    costs one)."""
    templates = [f"svc job{i} code <*> done" for i in range(1000)]
    texts = [f"svc job{i * 7 % 1000} code {i} done" for i in range(200)]
    texts.append("svc jobX code 1 done")  # unmatched
    df = spark.createDataFrame(
        [("c", i, s) for i, s in enumerate(texts)],
        "conv_id string, turn_idx int, text string",
    )
    got = (
        drain.match_templates(df, templates)
        .toPandas().sort_values("turn_idx").drain_template.tolist()
    )
    for i in range(200):
        assert got[i] == f"svc job{i * 7 % 1000} code <*> done"
    assert pd.isna(got[200])


def test_match_templates_rejects_trailing_newline(spark):
    """fullmatch semantics: a text ending in '\n' must NOT match (the
    alternation uses \\Z, where '$' under re.search would match)."""
    from ml4logs_spark.operators import drain

    turns = spark.createDataFrame(
        [("c0", 0, "ERROR disk sda"), ("c0", 1, "ERROR disk sda\n")],
        "conv_id string, turn_idx int, text string",
    )
    got = {r.turn_idx: r.drain_template
           for r in drain.match_templates(turns, ["ERROR disk <*>"]).collect()}
    assert got[0] == "ERROR disk <*>"
    assert got[1] is None


# ---------------------------------------------------------------------
# Reference-shaped fidelity golden (VERDICT r4 #7): HDFS-like content
# lines in the shape the reference's drain3 wrapper consumes after its
# header-strip regex (ibm_drain.py:40-45: `[^:]*: (?P<content>.*)` ->
# TemplateMiner.add_log_message per line). The golden below is the
# RECORDED template set our miner produced on this fixture, verified
# once by hand to be exact grammar recovery (one template per planted
# shape, every parameter position wildcarded, every constant kept) —
# any silent miner drift now fails this file.

def _hdfs_param(i: int, mod: int) -> int:
    import hashlib

    return int(hashlib.md5(f"{i}".encode()).hexdigest()[:6], 16) % mod


def _hdfs_lines(n: int = 400) -> list[str]:
    out = []
    for i in range(n):
        ip = f"10.0.{_hdfs_param(i, 4)}.{_hdfs_param(i + 7, 200)}:50010"
        blk = f"blk_{-1 if i % 3 else 1}{_hdfs_param(i, 10**6)}"
        k = i % 7
        if k == 0:
            out.append(f"Receiving block {blk} src: /{ip} dest: /{ip}")
        elif k == 1:
            out.append(f"PacketResponder {_hdfs_param(i, 3)} for block {blk} terminating")
        elif k == 2:
            out.append(
                "BLOCK* NameSystem.addStoredBlock: blockMap updated: "
                f"{ip} is added to {blk} size {_hdfs_param(i, 10**7)}"
            )
        elif k == 3:
            out.append(f"Verification succeeded for {blk}")
        elif k == 4:
            out.append(f"Deleting block {blk} file /data/current/{blk}")
        elif k == 5:
            out.append(
                "BLOCK* NameSystem.allocateBlock: "
                f"/user/job{_hdfs_param(i, 100)}/part-{_hdfs_param(i, 10)}. {blk}"
            )
        else:
            out.append(
                f"Received block {blk} of size {_hdfs_param(i, 10**7)} from /{ip}"
            )
    return out


HDFS_GOLDEN = [
    ("BLOCK* NameSystem.addStoredBlock: blockMap updated: <*> is added to <*> size <*>", 57),
    ("BLOCK* NameSystem.allocateBlock: <*> <*>", 57),
    ("Deleting block <*> file <*>", 57),
    ("PacketResponder <*> for block <*> terminating", 57),
    ("Received block <*> of size <*> from <*>", 57),
    ("Receiving block <*> src: <*> dest: <*>", 58),
    ("Verification succeeded for <*>", 57),
]


def test_hdfs_golden_template_set():
    """Exact grammar recovery on the reference-shaped fixture: the
    mined (template, occurrences) set equals the recorded golden."""
    from ml4logs_spark.operators.drain import DrainMiner

    m = DrainMiner()
    for ln in _hdfs_lines():
        m.add(ln)
    assert m.templates() == HDFS_GOLDEN


def test_hdfs_golden_order_insensitive():
    """templates() is pinned deterministic regardless of mining order:
    reversed and interleaved feeds recover the identical set (the
    reference's first-seen cluster ids are a single-thread artifact;
    the template TEXT set is the portable contract)."""
    from ml4logs_spark.operators.drain import DrainMiner

    lines = _hdfs_lines()
    for order in (list(reversed(lines)), lines[1::2] + lines[0::2]):
        m = DrainMiner()
        for ln in order:
            m.add(ln)
        assert [t for t, _ in m.templates()] == [t for t, _ in HDFS_GOLDEN]


def test_hdfs_golden_end_to_end_assignment(spark):
    """fit_templates + match_templates on the fixture as a transcripts
    frame: every line matches a golden template and per-template
    assignment counts equal the golden occurrences."""
    import pandas as pd

    from ml4logs_spark.operators import drain

    lines = _hdfs_lines()
    df = spark.createDataFrame(
        [("hdfs", i, s) for i, s in enumerate(lines)],
        "conv_id string, turn_idx int, text string",
    )
    tpls = drain.fit_templates(df, sample_size=len(lines))
    assert tpls == [t for t, _ in HDFS_GOLDEN]
    got = drain.match_templates(df, tpls).toPandas()
    assert not got.drain_template.isna().any()
    counts = got.drain_template.value_counts().to_dict()
    assert counts == {t: n for t, n in HDFS_GOLDEN}

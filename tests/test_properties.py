"""Property-based tests (hypothesis) for operator invariants that
golden fixtures can't sweep: arbitrary conversation-size multisets for
the distributed prefix sum, arbitrary float distributions (including
constant/degenerate groups) for the fit/apply scalers."""

import math

import pandas as pd
from hypothesis import given, settings, strategies as st
from pyspark.sql import functions as F

from ml4logs_spark.operators import features as feat
from ml4logs_spark.operators import windows

SLOW = dict(max_examples=8, deadline=None)


@settings(**SLOW)
@given(
    sizes=st.lists(st.integers(min_value=1, max_value=50), min_size=1, max_size=40),
    parts=st.integers(min_value=1, max_value=7),
)
def test_conv_offsets_prefix_sum_property(spark, sizes, parts):
    """Distributed two-phase prefix sum == pandas cumsum, for any
    conversation-size multiset and any partition count."""
    rows = [
        (f"c{i:04d}", t, "u", "x", None, None)
        for i, n in enumerate(sizes)
        for t in range(n)
    ]
    df = spark.createDataFrame(
        rows, "conv_id string, turn_idx int, role string, text string, "
              "tool string, ts timestamp"
    )
    got = (
        windows.conv_offsets(df, n_parts=parts)
        .toPandas().sort_values("conv_id").reset_index(drop=True)
    )
    expect = pd.DataFrame({
        "conv_id": [f"c{i:04d}" for i in range(len(sizes))],
        "conv_size": sizes,
    })
    expect["conv_offset"] = expect.conv_size.cumsum().shift(1, fill_value=0)
    assert got.conv_size.tolist() == expect.conv_size.tolist()
    assert got.conv_offset.tolist() == expect.conv_offset.tolist()


@settings(**SLOW)
@given(
    vals=st.lists(
        st.floats(min_value=-1e6, max_value=1e6, allow_nan=False),
        min_size=2, max_size=30,
    )
)
def test_minmax_scale_clip_property(spark, vals):
    """Scaled train values always land in [0, 1]; degenerate span -> 0."""
    rows = [(f"c{i}", float(v)) for i, v in enumerate(vals)]
    df = spark.createDataFrame(rows, "conv_id string, td double")
    out = feat.minmax_scale(df, "td", keys=[]).toPandas()
    assert ((out.td_scaled >= 0) & (out.td_scaled <= 1)).all()
    train = out[out.conv_id.map(
        lambda c: __import__("hashlib").md5(c.encode()).hexdigest()[0] <= "b"
    )]
    if len(train) and train.td.max() == train.td.min():
        assert (train.td_scaled == 0.0).all()


@settings(**SLOW)
@given(
    vals=st.lists(
        st.floats(min_value=-1e3, max_value=1e3, allow_nan=False),
        min_size=2, max_size=25,
    )
)
def test_standardize_property(spark, vals):
    """z of train rows has |mean| ~ 0 when train std > 0; zero-variance
    or singleton train -> all z == 0 (the reference's guard)."""
    rows = [(f"c{i}", float(v)) for i, v in enumerate(vals)]
    df = spark.createDataFrame(rows, "conv_id string, td double")
    out = feat.standardize(df, "td", keys=[]).toPandas()
    import hashlib

    train = out[out.conv_id.map(
        lambda c: hashlib.md5(c.encode()).hexdigest()[0] <= "b"
    )]
    sd = train.td.std(ddof=1) if len(train) >= 2 else 0.0
    # the zero-mean law only holds numerically when the spread is not
    # negligible RELATIVE to the magnitude: for values like 1000 +- 1e-10
    # the (x - mu) cancellation alone costs ~eps*|mu|/sd in z units
    if len(train) >= 2 and sd > 1e-7 * (1.0 + abs(train.td.mean())):
        assert abs(train.td_z.mean()) < 1e-6
    elif len(train) and (sd == 0.0 or len(train) < 2):
        assert (train.td_z == 0.0).all()
    assert out.td_z.notna().all()


@settings(**SLOW)
@given(
    la=st.integers(min_value=1, max_value=6),
    lb=st.integers(min_value=1, max_value=6),
    n=st.integers(min_value=1, max_value=10),
)
def test_merge_features_width_property(spark, la, lb, n):
    a = spark.createDataFrame(
        [(f"c{i}", 0, [float(j) for j in range(la)]) for i in range(n)],
        "conv_id string, turn_idx int, features array<double>",
    )
    b = spark.createDataFrame(
        [(f"c{i}", 0, [float(-j) for j in range(lb)]) for i in range(n)],
        "conv_id string, turn_idx int, features array<double>",
    )
    out = feat.merge_features(a, b, ["conv_id", "turn_idx"]).toPandas()
    assert len(out) == n
    assert out.features.map(len).eq(la + lb).all()


@settings(**SLOW)
@given(
    edges=st.lists(
        st.tuples(st.integers(0, 30), st.integers(0, 30)).filter(
            lambda e: e[0] != e[1]
        ),
        min_size=1,
        max_size=40,
    )
)
def test_connected_components_matches_union_find(spark, edges):
    """Min-label propagation + pointer jumping equals a reference
    union-find on arbitrary graphs (cycles, self-merging stars,
    disconnected pieces)."""
    from ml4logs_spark.operators import dedup

    pairs = spark.createDataFrame(
        [(int(a), int(b)) for a, b in edges], "doc_a long, doc_b long"
    )
    got = {
        r.doc_id: r.cluster_id
        for r in dedup.connected_components(pairs, max_iter=30).collect()
    }

    parent: dict[int, int] = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    want = {n: find(n) for n in parent}
    assert got == want


@settings(**SLOW)
@given(
    docs=st.lists(
        st.lists(st.sampled_from("abcde"), min_size=0, max_size=24),
        min_size=1, max_size=12,
    ),
    span=st.integers(min_value=1, max_value=5),
)
def test_span_dedup_matches_reference_property(spark, docs, span):
    """span_dedup == an independent Python reference over arbitrary
    small corpora: split each doc into non-overlapping span-token
    blocks, keep a block only at the minimum (doc_id, block_idx)
    holding its content, reassemble in order, drop emptied docs."""
    from ml4logs_spark.operators import dedup

    texts = [" ".join(toks) for toks in docs]
    df = spark.createDataFrame(
        list(enumerate(texts)), "doc_id long, text string"
    )
    got = {r.doc_id: r.text
           for r in dedup.span_dedup(df, span_tokens=span).collect()}

    first: dict[str, tuple[int, int]] = {}
    blocks: dict[int, list[tuple[int, str]]] = {}
    for i, text in enumerate(texts):
        toks = text.split(" ")  # '' -> [''] like Spark's split
        bs = [" ".join(toks[j:j + span]) for j in range(0, len(toks), span)]
        blocks[i] = list(enumerate(bs))
        for bi, b in blocks[i]:
            first.setdefault(b, (i, bi))
    want = {}
    for i in blocks:
        kept = [b for bi, b in blocks[i] if first[b] == (i, bi)]
        if kept:
            want[i] = " ".join(kept)
    assert got == want


@settings(**SLOW)
@given(
    docs=st.lists(
        st.lists(st.sampled_from(["w0", "w1", "w2", "w3"]),
                 min_size=4, max_size=12),
        min_size=2, max_size=8,
    ),
)
def test_incremental_near_dup_equals_batch_property(spark, docs):
    """For ANY corpus split into history (even ids, state only) and a
    new batch (odd ids), the store-verified incremental pairs equal the
    text-verified batch pairs restricted to pairs touching a new doc —
    same LSH banding, same Jaccard values, no extra or missing pairs."""
    from ml4logs_spark.operators import dedup

    rows = [(i, " ".join(toks)) for i, toks in enumerate(docs)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    batch = {
        (r.doc_a, r.doc_b): r.jaccard
        for r in dedup.near_dups(df, threshold=0.5).collect()
    }
    hist = df.filter("doc_id % 2 = 0")
    new = df.filter("doc_id % 2 = 1")
    inc = {
        (r.doc_a, r.doc_b): r.jaccard
        for r in dedup.incremental_near_dup_verified(
            new,
            dedup.lsh_bands(dedup.minhash_signatures(hist)),
            dedup.shingle_store(hist),
            threshold=0.5,
        ).collect()
    }
    want = {p: j for p, j in batch.items() if p[0] % 2 == 1 or p[1] % 2 == 1}
    assert inc == want


@settings(**SLOW)
@given(
    # per-conv turn text lists; texts may contain the separator byte
    # and colons — the framing must stay unambiguous regardless
    convs=st.lists(
        st.lists(
            st.text(alphabet="ab:\x1f", max_size=4), min_size=1, max_size=4
        ),
        min_size=1,
        max_size=10,
    ),
)
def test_conv_dedup_groups_match_reference(spark, convs):
    """conv_dedup_survivors keeps exactly one conv per distinct ordered
    turn-text tuple (lowest conv_id), for ANY texts — including ones
    containing the separator byte, which the length-prefix framing must
    keep unambiguous."""
    from ml4logs_spark.operators import dedup

    rows = [
        (f"c{i:03d}", t, "u", txt, None, None)
        for i, texts in enumerate(convs)
        for t, txt in enumerate(texts)
    ]
    df = spark.createDataFrame(
        rows, "conv_id string, turn_idx int, role string, text string, "
              "tool string, ts timestamp"
    )
    kept = {
        r["conv_id"]
        for r in dedup.conv_dedup_survivors(df)
        .select("conv_id").distinct().collect()
    }
    expect = {}
    for i, texts in enumerate(convs):
        expect.setdefault(tuple(texts), f"c{i:03d}")
    assert kept == set(expect.values())


@settings(**SLOW)
@given(
    texts=st.lists(st.text(alphabet="ab c", max_size=12), min_size=1, max_size=25),
    n_batches=st.integers(min_value=1, max_value=4),
)
def test_vocab_merge_chain_equals_batch_property(spark, texts, n_batches):
    """Any batch partitioning of any corpus: chained merge_vocab_counts
    equals one batch count (df/tf additivity over disjoint doc_ids)."""
    from ml4logs_spark.operators import textqa

    docs = spark.createDataFrame(
        [(i, t, "s") for i, t in enumerate(texts)],
        "doc_id long, text string, source string",
    )
    state = textqa.vocab_counts(docs.filter(f"doc_id % {n_batches} = 0"))
    for b in range(1, n_batches):
        state = textqa.merge_vocab_counts(
            state, docs.filter(f"doc_id % {n_batches} = {b}")
        )
    merged = {r["token"]: (r["df"], r["tf"]) for r in state.collect()}
    batch = {
        r["token"]: (r["df"], r["tf"])
        for r in textqa.vocab_counts(docs).collect()
    }
    assert merged == batch


@settings(**SLOW)
@given(
    counts=st.lists(st.integers(min_value=1, max_value=500), min_size=1, max_size=8),
    alpha=st.sampled_from([0.5, 0.75, 1.0]),
)
def test_temperature_rates_property(spark, counts, alpha):
    """Rates match the pure-Python floor((n_min/n)^(1-alpha) * 65536)
    for any source-size multiset and every sqrt-chain alpha; the
    smallest source always keeps everything."""
    import hashlib

    from ml4logs_spark.operators import textqa

    rows, did = [], 0
    for s, n in enumerate(counts):
        for _ in range(n):
            rows.append((did, "x", f"s{s}"))
            did += 1
    docs = spark.createDataFrame(rows, "doc_id long, text string, source string")
    got = {
        r["source"]: r["rate_int"]
        for r in textqa.temperature_mix_rates(docs, alpha=alpha).collect()
    }
    n_min = min(counts)
    exp = {
        f"s{s}": math.floor((n_min / n) ** (1 - alpha) * 65536)
        for s, n in enumerate(counts)
    }
    assert got == exp
    assert got[f"s{counts.index(n_min)}"] == 65536


@settings(**SLOW)
@given(
    sizes=st.lists(st.integers(min_value=0, max_value=30),
                   min_size=1, max_size=30),
    budget=st.integers(min_value=1, max_value=40),
    parts=st.integers(min_value=1, max_value=7),
)
def test_pack_conversations_stream_property(spark, sizes, budget, parts):
    """Conversation packing == pandas cumsum + integer division, for
    any token-count multiset, budget, and partition count."""
    rows = [
        (f"c{i:04d}", 0, "u", " ".join(["t"] * n) if n else None, None, None)
        for i, n in enumerate(sizes)
    ]
    df = spark.createDataFrame(
        rows, "conv_id string, turn_idx int, role string, text string, "
              "tool string, ts timestamp"
    )
    got = (
        windows.pack_conversations(df, seq_tokens=budget, n_parts=parts)
        .toPandas().sort_values("conv_id").reset_index(drop=True)
    )
    offs = pd.Series(sizes).cumsum().shift(1, fill_value=0)
    assert got.conv_tokens.tolist() == sizes
    assert got.token_offset.tolist() == offs.tolist()
    assert got.seq_id.tolist() == (offs // budget).tolist()
    assert got.seq_pos.tolist() == (offs % budget).tolist()


@settings(**SLOW)
@given(
    texts=st.lists(
        st.lists(st.sampled_from("abcd"), min_size=0, max_size=6).map(
            lambda cs: " ".join(cs)
        ),
        min_size=1, max_size=20,
    )
)
def test_bigram_novelty_matches_python(spark, texts):
    """novel_frac == a pure-Python count of bigrams unique to one doc,
    for any small random corpus; frac always within [0, 1]."""
    from collections import Counter

    from ml4logs_spark.operators import textqa

    docs = spark.createDataFrame(
        [(i, t, "s") for i, t in enumerate(texts)],
        "doc_id long, text string, source string",
    )
    got = {r.doc_id: (r.n_bigrams, r.novel_frac)
           for r in textqa.bigram_novelty(docs).collect()}
    pairs_by_doc = {
        i: [(w[j], w[j + 1]) for j in range(len(w) - 1)]
        for i, t in enumerate(texts)
        for w in [[x for x in t.split(" ") if x]]
    }
    owners = Counter()
    for i, ps in pairs_by_doc.items():
        for p in set(ps):
            owners[p] += 1
    for i, ps in pairs_by_doc.items():
        n = len(ps)
        nov = sum(1 for p in ps if owners[p] == 1)
        exp = (n, round(nov / n, 6) if n else None)
        assert got[i] == exp
        if n:
            assert 0.0 <= got[i][1] <= 1.0


@settings(**SLOW)
@given(
    convs=st.lists(
        st.lists(
            st.sampled_from(["user", "assistant", "system", "tool"]),
            min_size=1,
            max_size=12,
        ),
        min_size=1,
        max_size=10,
    ),
)
def test_conv_quality_flags_matches_python_reference(spark, convs):
    """conv_quality_flags == an independent pure-Python rule
    evaluation, for arbitrary role sequences (run-length, fractions,
    opening role, and every pass flag)."""
    rows = [
        (f"c{i:03d}", t, role, f"w{t}", None, None)
        for i, roles in enumerate(convs)
        for t, role in enumerate(roles)
    ]
    df = spark.createDataFrame(
        rows, "conv_id string, turn_idx int, role string, text string, "
              "tool string, ts timestamp"
    )
    kw = dict(min_turns=2, max_turns=8, max_role_run=2,
              min_user_frac=0.3, max_tool_frac=0.25)
    got = {
        r["conv_id"]: r.asDict()
        for r in windows.conv_quality_flags(df, **kw).collect()
    }
    for i, roles in enumerate(convs):
        cid = f"c{i:03d}"
        n = len(roles)
        max_run = 1
        run = 1
        for a, b in zip(roles, roles[1:]):
            run = run + 1 if a == b else 1
            max_run = max(max_run, run)
        user_frac = round(roles.count("user") / n, 6)
        tool_frac = round(roles.count("tool") / n, 6)
        g = got[cid]
        assert g["n_turns"] == n and g["max_role_run"] == max_run
        assert g["user_frac"] == user_frac and g["tool_frac"] == tool_frac
        assert g["opening_role"] == roles[0]
        expected_passes = (
            kw["min_turns"] <= n <= kw["max_turns"]
            and max_run <= kw["max_role_run"]
            and user_frac >= kw["min_user_frac"]
            and tool_frac <= kw["max_tool_frac"]
            and roles[0] in ("user", "system")
        )
        assert g["passes"] == expected_passes, (cid, roles, g)


@settings(**SLOW)
@given(
    seqs=st.lists(
        st.lists(st.sampled_from(["p", "q", "r"]), min_size=1, max_size=6),
        min_size=2,
        max_size=12,
    )
)
def test_conv_prefix_dups_property(spark, seqs):
    """The positional-hash prefix detector == a brute-force Python
    proper-prefix check, for arbitrary small-alphabet conversation
    sets (tiny alphabet maximizes shared prefixes, equal-length dups,
    and chain cases stub<mid<long)."""
    from ml4logs_spark.operators import dedup

    rows = [
        (f"c{i:03d}", t, txt)
        for i, toks in enumerate(seqs)
        for t, txt in enumerate(toks)
    ]
    t = spark.createDataFrame(rows, "conv_id string, turn_idx int, text string")
    got = {tuple(r) for r in dedup.conv_prefix_dups(t).collect()}
    want = set()
    for i, a in enumerate(seqs):
        for j, b in enumerate(seqs):
            if i != j and len(a) < len(b) and b[: len(a)] == a:
                want.add((f"c{i:03d}", f"c{j:03d}", len(a), len(b)))
    assert got == want


@settings(**SLOW)
@given(
    lats=st.lists(
        st.integers(min_value=-1000, max_value=2**40),
        min_size=1, max_size=60,
    ),
    qs=st.lists(
        st.sampled_from([1, 5, 25, 50, 75, 95, 99, 100]),
        min_size=1, max_size=3, unique=True,
    ),
)
def test_latency_histogram_bucket_and_percentile_property(spark, lats, qs):
    """The integer bucket floor equals Python's 1 << (bit_length-1)
    (0 for non-positive latencies), and the published percentile bucket
    equals a pure-Python reference: the bucket of the (n*p + 99) // 100
    -th smallest latency under type-1 semantics."""
    from ml4logs_spark.operators import windows

    def py_bucket(v):
        return 0 if v <= 0 else 1 << (v.bit_length() - 1)

    df = spark.createDataFrame(
        [("t", int(v)) for v in lats], "tool string, lat_us long"
    )
    hist = windows.histogram_from_latencies(df)
    got_hist = {(r.bucket_lo): r.n for r in hist.collect()}
    want_hist = {}
    for v in lats:
        b = py_bucket(v)
        want_hist[b] = want_hist.get(b, 0) + 1
    assert got_hist == want_hist

    got = {
        r.q_pct: (r.n_timed, r.bucket_lo)
        for r in windows.latency_percentiles_from_histogram(
            hist, qs=tuple(p / 100 for p in qs)
        ).collect()
    }
    n = len(lats)
    # reference: rank into the sorted BUCKET multiset (the histogram
    # forgets within-bucket order, but bucketing is monotone, so the
    # r-th smallest bucket == bucket of the r-th smallest latency)
    buckets_sorted = sorted(py_bucket(v) for v in lats)
    want = {
        p: (n, buckets_sorted[(n * p + 99) // 100 - 1]) for p in qs
    }
    assert got == want

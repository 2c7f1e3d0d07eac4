"""Round-5 training-prep operators: stream packing (pack_sequences),
boilerplate-span removal, and the deterministic train/val/test split.
Each is checked against an independent Python reference or a planted
fixture, not just the DuckDB oracle (which runs separately via the
oracle gate)."""

import pytest

from pyspark.sql import functions as F


def _mk_docs(spark, texts):
    return spark.createDataFrame(
        [(i, t, f"src{i % 3}") for i, t in enumerate(texts)],
        "doc_id long, text string, source string",
    )


# ------------------------------------------------------------- packing

def test_pack_sequences_matches_python_prefix_sum(spark):
    from ml4logs_spark.operators import textqa

    texts = [" ".join(f"w{i}t{j}" for j in range(5 + (i * 7) % 40))
             for i in range(30)]
    ch = textqa.chunk_documents(_mk_docs(spark, texts), chunk_tokens=8, overlap=2)
    out = textqa.pack_sequences(ch, seq_tokens=16, n_parts=4)
    rows = sorted(
        out.select("doc_id", "chunk_idx", "n_tokens", "token_offset",
                   "seq_id", "seq_pos").collect(),
        key=lambda r: (r.doc_id, r.chunk_idx),
    )
    off = 0
    for r in rows:
        assert r.token_offset == off
        assert r.seq_id == off // 16
        assert r.seq_pos == off % 16
        off += r.n_tokens


def test_pack_sequences_partition_invariant(spark):
    """The global prefix sum must not depend on how many range
    partitions the two-phase computation used."""
    from ml4logs_spark.operators import textqa

    texts = [" ".join(f"t{j}" for j in range(3 + i % 9)) for i in range(40)]
    ch = textqa.chunk_documents(_mk_docs(spark, texts), chunk_tokens=4, overlap=0)
    a = textqa.pack_sequences(ch, seq_tokens=10, n_parts=1)
    b = textqa.pack_sequences(ch, seq_tokens=10, n_parts=7)
    cols = ["doc_id", "chunk_idx", "token_offset", "seq_id", "seq_pos"]
    assert sorted(map(tuple, a.select(cols).collect())) == \
        sorted(map(tuple, b.select(cols).collect()))


def test_pack_sequences_carries_chunk_text_and_validates(spark):
    from ml4logs_spark.operators import textqa

    ch = textqa.chunk_documents(_mk_docs(spark, ["a b c d e f"]), 4, 1)
    out = textqa.pack_sequences(ch, seq_tokens=4)
    assert "chunk_text" in out.columns
    with pytest.raises(ValueError):
        textqa.pack_sequences(ch, seq_tokens=0)


# ------------------------------------------------- boilerplate removal

def test_boilerplate_span_filter_drops_frequent_keeps_rare(spark):
    from ml4logs_spark.operators import dedup

    boiler = " ".join(f"b{i}" for i in range(4))     # planted in 5 docs
    rare = " ".join(f"r{i}" for i in range(4))       # planted in 2 docs
    texts = [f"{boiler} u{k}0 u{k}1 u{k}2 u{k}3" for k in range(5)]
    texts += [f"{rare} v{k}0 v{k}1 v{k}2 v{k}3" for k in range(2)]
    out = dedup.boilerplate_span_filter(
        _mk_docs(spark, texts), max_doc_freq=2, span_tokens=4
    )
    got = {r.doc_id: r.text for r in out.collect()}
    # the frequent block vanished from EVERY doc (including the first
    # occurrence — this is removal, not dedup) ...
    for k in range(5):
        assert got[k] == f"u{k}0 u{k}1 u{k}2 u{k}3"
    # ... while the rare duplicate (df=2 <= max_doc_freq) survives in both
    for k in range(5, 7):
        assert got[k].startswith(rare)


def test_boilerplate_pure_boilerplate_doc_drops_out(spark):
    from ml4logs_spark.operators import dedup

    common = "x0 x1 x2 x3"
    texts = [common] * 4 + [f"{common} extra0 extra1 extra2 extra3"]
    out = dedup.boilerplate_span_filter(
        _mk_docs(spark, texts), max_doc_freq=2, span_tokens=4
    )
    got = {r.doc_id: r.text for r in out.collect()}
    assert set(got) == {4}
    assert got[4] == "extra0 extra1 extra2 extra3"


def test_boilerplate_null_text_follows_contract(spark):
    """NULL text coalesces to '' (span_blocks contract): with few empty
    docs the empty block is rare and survives as ''."""
    from ml4logs_spark.operators import dedup

    docs = spark.createDataFrame(
        [(0, None, "s"), (1, "a b", "s")],
        "doc_id long, text string, source string",
    )
    out = dedup.boilerplate_span_filter(docs, max_doc_freq=2, span_tokens=4)
    got = {r.doc_id: r.text for r in out.collect()}
    assert got == {0: "", 1: "a b"}


# ------------------------------------------------------- dataset split

def test_dataset_split_disjoint_exhaustive_deterministic(spark):
    from ml4logs_spark.operators import textqa

    docs = _mk_docs(spark, [f"doc {i}" for i in range(400)])
    a = textqa.dataset_split(docs, val_hex="2000", test_hex="2000")
    counts = {r.split: r.n for r in
              a.groupBy("split").agg(F.count("*").alias("n")).collect()}
    assert sum(counts.values()) == 400
    # 1/8 expected per holdout; wide tolerance, determinism is the contract
    assert 20 <= counts.get("test", 0) <= 80
    assert 20 <= counts.get("val", 0) <= 80
    b = textqa.dataset_split(docs.repartition(7), val_hex="2000", test_hex="2000")
    assert sorted(map(tuple, a.select("doc_id", "split").collect())) == \
        sorted(map(tuple, b.select("doc_id", "split").collect()))


def test_dataset_split_nests_hash_sample_draw(spark):
    """test region [0, t) is exactly hash_sample(t)'s draw — holdouts
    and samples stay mutually consistent."""
    from ml4logs_spark.operators import textqa

    docs = _mk_docs(spark, [f"d {i}" for i in range(300)])
    test_ids = {
        r.doc_id
        for r in textqa.dataset_split(docs, test_hex="1000", val_hex="1000")
        .filter("split = 'test'").collect()
    }
    sample_ids = {r.doc_id for r in textqa.hash_sample(docs, "1000").collect()}
    assert test_ids == sample_ids


def test_dataset_split_degenerate_total_holdout(spark):
    from ml4logs_spark.operators import textqa

    docs = _mk_docs(spark, [f"d {i}" for i in range(50)])
    out = textqa.dataset_split(docs, val_hex="8000", test_hex="8000")
    assert out.filter("split = 'train'").count() == 0
    with pytest.raises(ValueError):
        textqa.dataset_split(docs, val_hex="xyz")

"""int8 scalar quantization for embeddings + vocabulary coverage —
checked against independent Python references (numpy for the affine
codes, hand counts for OOV)."""

import numpy as np
import pytest

from pyspark.sql import functions as F


def _emb(spark, vecs):
    return spark.createDataFrame(
        [(i, [float(x) for x in v]) for i, v in enumerate(vecs)],
        "vec_id long, embedding array<float>",
    )


def test_quantize_matches_numpy_reference(spark):
    from ml4logs_spark.operators import similarity as sim

    rng = np.random.default_rng(7)
    vecs = rng.normal(size=(40, 8)).astype(np.float32)
    codes = {
        r.vec_id: r.codes
        for r in sim.quantize_embeddings(_emb(spark, vecs)).collect()
    }
    lo = vecs.astype(np.float64).min(axis=0)
    hi = vecs.astype(np.float64).max(axis=0)
    for i, v in enumerate(vecs):
        expect = np.floor(
            (v.astype(np.float64) - lo) / (hi - lo) * 255 + 0.5
        ).astype(int) - 128
        assert list(codes[i]) == list(expect)
        assert all(-128 <= c <= 127 for c in codes[i])


def test_quantize_roundtrip_error_bounded(spark):
    """Dequantized values must sit within half a quantization step of
    the originals — the affine-code contract."""
    from ml4logs_spark.operators import similarity as sim

    rng = np.random.default_rng(3)
    vecs = rng.uniform(-1, 1, size=(30, 6)).astype(np.float32)
    emb = _emb(spark, vecs)
    q = sim.fit_quantizer(emb)
    deq = {
        r.vec_id: r.qvec
        for r in sim.dequantize(sim.quantize_embeddings(emb, q), q).collect()
    }
    lo = vecs.astype(np.float64).min(axis=0)
    hi = vecs.astype(np.float64).max(axis=0)
    step = (hi - lo) / 255
    for i, v in enumerate(vecs):
        err = np.abs(np.array(deq[i]) - v.astype(np.float64))
        assert (err <= step / 2 + 1e-12).all()


def test_quantize_degenerate_dim_is_zero(spark):
    from ml4logs_spark.operators import similarity as sim

    vecs = [[1.0, 0.5], [1.0, -0.5], [1.0, 0.25]]  # dim 0 constant
    codes = {
        r.vec_id: r.codes
        for r in sim.quantize_embeddings(_emb(spark, vecs)).collect()
    }
    assert all(codes[i][0] == 0 for i in range(3))


def test_quantized_topk_recall_reasonable(spark):
    """int8 at 8 bits/dim keeps cosine ranks nearly intact; recall@5
    on a 100-vector corpus should be high (deterministic fixture)."""
    from ml4logs_spark.operators import similarity as sim

    rng = np.random.default_rng(11)
    vecs = rng.normal(size=(100, 16)).astype(np.float32)
    rec = sim.quantized_recall(_emb(spark, vecs), [0, 1, 2], k=5)
    assert rec >= 0.8


def test_vocab_coverage_hand_computed(spark):
    from ml4logs_spark.operators import textqa

    docs = spark.createDataFrame(
        [
            (0, "aa bb aa cc", "s"),   # aa df=2, bb df=2, cc df=1
            (1, "aa bb zz", "s"),      # zz df=1
            (2, None, "s"),            # tokenless -> zero-fill
        ],
        "doc_id long, text string, source string",
    )
    vocab = textqa.build_vocab(docs, min_df=2, max_df_ratio=1.0)
    got = {
        r.doc_id: (r.n_tokens, r.n_oov, r.oov_frac)
        for r in textqa.vocab_coverage(docs, vocab).collect()
    }
    # vocab = {aa, bb}; doc0 oov = {cc}x1 of 4; doc1 oov = {zz}x1 of 3
    assert got[0] == (4, 1, 0.25)
    assert got[1] == (3, 1, round(1 / 3, 6))
    assert got[2] == (0, 0, 0.0)


def test_quantizer_empty_input(spark):
    from ml4logs_spark.operators import similarity as sim

    emb = spark.createDataFrame([], "vec_id long, embedding array<float>")
    assert sim.fit_quantizer(emb).count() == 0
    assert sim.quantize_embeddings(emb).count() == 0
    assert sim.quantized_topk(emb, [0], k=5).count() == 0

"""Product quantization: fit/encode/decode/topk with known answers."""

import numpy as np
import pytest

from ml4logs_spark.operators import similarity

from tests.test_dedup_similarity import _clustered_emb


def _pq_kw(dim=16):
    # small-fixture config: dim 16 -> 4 subspaces of 4 dims
    # sample_mod=1: the fixture's cluster is vec_id % 4, so any even
    # sample_mod aliases the Lloyd sample onto a cluster subset (a
    # fixture artifact, not a corpus property — real ids carry no
    # cluster period; measured: mod=2 leaves only clusters {0,2} in
    # the sample and top-k purity at 0.5)
    return dict(m=4, dim=dim, ksub=8, n_iters=2, sample_mod=1)


def test_pq_codes_shape_and_identical_vectors_share_codes(spark):
    emb = _clustered_emb(spark, n=60, dim=16)
    # plant exact duplicates: 100/101 copy vectors 0/1
    dup = emb.filter("vec_id < 2").selectExpr(
        "vec_id + 100 AS vec_id", "embedding"
    )
    full = emb.unionByName(dup)
    kw = _pq_kw()
    cb = similarity.fit_pq_codebooks(full, **kw)
    codes = similarity.pq_encode(full, cb, m=kw["m"], dim=kw["dim"]).toPandas()
    assert len(codes) == 62
    assert all(len(c) == 4 for c in codes.codes)
    by_id = {r.vec_id: list(r.codes) for r in codes.itertuples()}
    assert by_id[100] == by_id[0]
    assert by_id[101] == by_id[1]


def test_pq_fit_is_partition_invariant(spark):
    emb = _clustered_emb(spark, n=60, dim=16)
    kw = _pq_kw()
    outs = []
    for parts in (1, 3, 16):
        cb = similarity.fit_pq_codebooks(emb.repartition(parts), **kw)
        pdf = cb.toPandas().sort_values(["sub", "cent_id"]).reset_index(drop=True)
        outs.append([
            (int(r.sub), int(r.cent_id), tuple(r.cv)) for r in pdf.itertuples()
        ])
    assert outs[0] == outs[1] == outs[2]


def test_pq_decode_reconstructs_close_to_original(spark):
    """On the clustered fixture the PQ reconstruction must sit on the
    right side of the space: cosine(original, decoded-self) beats
    cosine(original, decoded-other-cluster) for every vector."""
    emb = _clustered_emb(spark, n=40, dim=16, noise=0.05)
    kw = _pq_kw()
    cb = similarity.fit_pq_codebooks(emb, **kw)
    dec = similarity.pq_decode(
        similarity.pq_encode(emb, cb, m=kw["m"], dim=kw["dim"]), cb
    ).toPandas()
    orig = {r.vec_id: np.array(r.embedding, dtype="float64")
            for r in emb.toPandas().itertuples()}
    recon = {r.vec_id: np.array(r.pqvec) for r in dec.itertuples()}
    assert set(recon) == set(orig)
    assert all(len(v) == 16 for v in recon.values())

    def cos(a, b):
        return float(a @ b / (np.linalg.norm(a) * np.linalg.norm(b)))

    for i in orig:
        self_cos = cos(orig[i], recon[i])
        other = (i + 2) % 4 + (i // 4) * 4  # same fixture, different cluster
        if other in orig:
            assert self_cos > cos(orig[i], recon[other]), i


def test_pq_topk_cluster_purity_and_recall(spark):
    """Coarse codes collapse within-cluster rank order (members of a
    tight cluster share codes, so exact top-5 vs PQ top-5 differ in
    WHICH near-tied cellmates surface) — the right accuracy bar for
    PQ is neighborhood membership, with a loose rank-recall floor."""
    emb = _clustered_emb(spark, n=80, dim=16, noise=0.05)
    kw = _pq_kw()
    tk = similarity.pq_topk(emb, query_ids=[0, 1, 2, 3], k=5, **kw).toPandas()
    purity = ((tk.query_id % 4) == (tk.cand_id % 4)).mean()
    assert purity == 1.0, purity
    rec = similarity.pq_recall(emb, query_ids=[0, 1, 2], k=5, **kw)
    assert rec >= 0.3, rec


def test_pq_rejects_indivisible_dim(spark):
    emb = _clustered_emb(spark, n=10, dim=16)
    with pytest.raises(ValueError):
        similarity.fit_pq_codebooks(emb, m=3, dim=16)


def test_pq_empty_input(spark):
    empty = spark.createDataFrame([], "vec_id long, embedding array<float>")
    kw = _pq_kw()
    cb = similarity.fit_pq_codebooks(empty, **kw)
    assert cb.count() == 0
    assert similarity.pq_encode(empty, cb, m=4, dim=16).count() == 0

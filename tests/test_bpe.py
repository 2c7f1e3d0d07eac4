"""BPE merge learning: hand-computed merges, equivalence against an
independent pure-Python reference (same tie-breaks), early stop, and
the encode compression diagnostic."""

from collections import Counter

import pytest

from ml4logs_spark.operators import bpe


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string, source string")


def _py_bpe(texts, n_merges):
    """Independent reference: word-type counts, weighted pair counts,
    max by (count DESC, a ASC, b ASC), greedy left-to-right apply,
    stop when the best pair count < 2."""
    words = Counter()
    for t in texts:
        for w in (t or "").lower().split(" "):
            if w:
                words[w] += 1
    syms = {w: list(w) + [bpe.EOW] for w in words}
    merges = []
    for rank in range(n_merges):
        pairs = Counter()
        for w, n in words.items():
            s = syms[w]
            for i in range(len(s) - 1):
                pairs[(s[i], s[i + 1])] += n
        if not pairs:
            break
        best = min(pairs.items(), key=lambda kv: (-kv[1], kv[0]))
        (a, b), cnt = best
        if cnt < 2:
            break
        merges.append((rank, a, b, cnt))
        for w in syms:
            s, out = syms[w], []
            for tok in s:
                if out and out[-1] == a and tok == b:
                    out[-1] = a + b
                else:
                    out.append(tok)
            syms[w] = out
    return merges


def test_bpe_fit_hand_computed(spark):
    """'low low lower': first merge is (l, o) count 3, then (lo, w)
    count 3, then w</w> from the two 'low's."""
    docs = _docs(spark, [(0, "low low lower", "s")])
    got = [(r.merge_rank, r.tok_a, r.tok_b, r.pair_count)
           for r in bpe.bpe_fit(docs, n_merges=3).collect()]
    assert got[0] == (0, "l", "o", 3)
    assert got[1] == (1, "lo", "w", 3)
    assert got[2] == (2, "low", bpe.EOW, 2)


def test_bpe_fit_matches_python_reference(spark):
    texts = [
        "the cat sat on the mat",
        "the cats sat on the mats",
        "a rat sat where the cat sat",
        "banana bandana and a banana stand",
        None,
        "",
    ]
    docs = _docs(spark, [(i, t, "s") for i, t in enumerate(texts)])
    got = [(r.merge_rank, r.tok_a, r.tok_b, r.pair_count)
           for r in bpe.bpe_fit(docs, n_merges=12).collect()]
    assert got == _py_bpe(texts, 12)


def test_bpe_fit_early_stop_and_validation(spark):
    # all-hapax corpus: no pair reaches count 2 -> zero merges
    docs = _docs(spark, [(0, "ab cd", "s")])
    assert bpe.bpe_fit(docs, n_merges=5).count() == 0
    with pytest.raises(ValueError, match="n_merges"):
        bpe.bpe_fit(docs, n_merges=0)


def test_bpe_encode_compression(spark):
    """More merges -> fewer pieces; zero merges -> chars+1 per word;
    empty/NULL docs keep a (0, 0) row."""
    texts = ["low low lower lowest", "low slow flow", ""]
    docs = _docs(spark, [(i, t, "s") for i, t in enumerate(texts)])
    m0 = bpe.bpe_fit(docs, n_merges=1).limit(0)  # empty merge table
    e0 = {r.doc_id: (r.n_words, r.n_pieces)
          for r in bpe.bpe_encode(docs, m0).collect()}
    assert e0[0] == (4, sum(len(w) + 1 for w in texts[0].split()))
    assert e0[2] == (0, 0)
    m8 = bpe.bpe_fit(docs, n_merges=8)
    e8 = {r.doc_id: (r.n_words, r.n_pieces)
          for r in bpe.bpe_encode(docs, m8).collect()}
    assert e8[0][0] == 4 and e8[0][1] < e0[0][1]
    assert e8[1][0] == 3 and e8[1][1] < e0[1][1]

"""Multinomial NB classifier: hand-computed posteriors, OOV/empty-text
contracts, planted-signal recovery, and fit/apply == split-query
equivalence."""

import math

from ml4logs_spark.operators import classify


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string, source string")


def _micro(x: float) -> int:
    # round-half-away-from-zero to micro-units, like both engines
    return int(math.floor(abs(x) * 1e6 + 0.5)) * (1 if x >= 0 else -1)


def test_nb_hand_computed(spark):
    """Exact posteriors on a 2-class corpus: c(t,k), N_k, V and priors
    all small enough to fold by hand; unseen (token, label) pairs take
    the smoothed floor; argmax picks the right class."""
    train = _docs(spark, [
        (0, "ham ham eggs", "food"),
        (2, "code code spark", "tech"),
    ])
    # vocab = {ham, eggs, code, spark}, V=4; N_food = N_tech = 3
    # priors: ln(1/2) each
    ll = {
        ("food", "ham"): math.log(3 / 7), ("food", "eggs"): math.log(2 / 7),
        ("food", "code"): math.log(1 / 7), ("food", "spark"): math.log(1 / 7),
        ("tech", "ham"): math.log(1 / 7), ("tech", "eggs"): math.log(1 / 7),
        ("tech", "code"): math.log(3 / 7), ("tech", "spark"): math.log(2 / 7),
    }
    loglik, priors = classify.nb_fit(train)
    got_ll = {(r.label, r.token): r.ll_micro for r in loglik.collect()}
    assert got_ll == {k: _micro(v) for k, v in ll.items()}
    assert {r.label: r.prior_micro for r in priors.collect()} == {
        "food": _micro(math.log(0.5)), "tech": _micro(math.log(0.5)),
    }
    test = _docs(spark, [(1, "ham eggs", "?"), (3, "spark code zzz", "?")])
    got = {r.doc_id: (r.pred_label, r.logpost_micro)
           for r in classify.nb_classify(test, loglik, priors).collect()}
    # doc 1: food = ln.5 + ll(ham|food) + ll(eggs|food); zzz is OOV
    exp1 = _micro(math.log(0.5)) + _micro(ll["food", "ham"]) + _micro(
        ll["food", "eggs"])
    exp3 = _micro(math.log(0.5)) + _micro(ll["tech", "spark"]) + _micro(
        ll["tech", "code"])
    assert got[1] == ("food", exp1)
    assert got[3] == ("tech", exp3)


def test_nb_empty_text_and_ties(spark):
    """Empty/NULL-text docs keep a row and predict the max-prior class;
    an exact posterior tie breaks to the lexicographically smallest
    label (symmetric corpus -> symmetric scores)."""
    train = _docs(spark, [
        (0, "x", "b"), (2, "y", "a"),      # symmetric: tie on 'x y'?
        (4, "x", "b"),                     # b has the larger prior
    ])
    loglik, priors = classify.nb_fit(train)
    test = _docs(spark, [(1, "", "?"), (3, None, "?")])
    got = {r.doc_id: r.pred_label
           for r in classify.nb_classify(test, loglik, priors).collect()}
    assert got == {1: "b", 3: "b"}  # prior-only -> max prior class
    # symmetric single-token corpus: "a"-labeled y and "b"-labeled x at
    # equal counts -> a doc containing both tokens ties -> min label
    train2 = _docs(spark, [(0, "x", "b"), (2, "y", "a")])
    ll2, pr2 = classify.nb_fit(train2)
    test2 = _docs(spark, [(1, "x y", "?")])
    row = classify.nb_classify(test2, ll2, pr2).collect()[0]
    assert row.pred_label == "a"


def test_nb_recovers_planted_signal(spark):
    """Each source plants a marker token in its docs amid shared noise;
    the split classifier labels >90% of held-out docs correctly."""
    rows = []
    for i in range(200):
        k = (i // 2) % 4  # class independent of even/odd, so the
        src = f"s{k}"     # train split (even ids) sees every class
        rows.append((i, f"common words here marker{k} tail", src))
    docs = _docs(spark, rows)
    out = classify.nb_source_classify_split(docs).collect()
    assert len(out) == 100  # odd ids only
    acc = sum(r.pred_label == f"s{(r.doc_id // 2) % 4}" for r in out) / len(out)
    assert acc == 1.0


def test_nb_split_query_equals_manual_composition(spark):
    """nb_source_classify_split == nb_fit(even) |> nb_classify(odd)."""
    rows = [(i, f"tok{i % 5} tok{i % 3} filler", f"s{i % 3}")
            for i in range(60)]
    docs = _docs(spark, rows)
    via_split = {(r.doc_id, r.pred_label, r.logpost_micro)
                 for r in classify.nb_source_classify_split(docs).collect()}
    from pyspark.sql import functions as F
    ll, pr = classify.nb_fit(docs.filter(F.col("doc_id") % 2 == 0))
    manual = {(r.doc_id, r.pred_label, r.logpost_micro)
              for r in classify.nb_classify(
                  docs.filter(F.col("doc_id") % 2 == 1), ll, pr).collect()}
    assert via_split == manual


def test_nb_confusion_diagonal_on_planted_signal(spark):
    """Planted-marker corpus: the confusion matrix is exactly the
    diagonal (25 held-out docs per class, all correct)."""
    rows = [(i, f"common words marker{(i // 2) % 4} tail",
             f"s{(i // 2) % 4}") for i in range(200)]
    got = {(r.source, r.pred_label): r.n
           for r in classify.nb_confusion(_docs(spark, rows)).collect()}
    assert got == {(f"s{k}", f"s{k}"): 25 for k in range(4)}


def test_nb_empty_input(spark):
    docs = _docs(spark, [])
    loglik, priors = classify.nb_fit(docs)
    assert loglik.count() == 0 and priors.count() == 0
    assert classify.nb_classify(docs, loglik, priors).count() == 0
    assert classify.nb_source_classify_split(docs).count() == 0

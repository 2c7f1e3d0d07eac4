"""The full training-data curation pipeline as one declarative plan.

Chains the individual curation operators — exact dedup, quality gate,
benchmark decontamination, PII masking, token-window chunking — into a
single DataFrame so Catalyst plans the WHOLE pipeline at once: filters
and projections fuse, the scan is shared, and nothing materializes
between stages. This is the composition a user of the reference would
script step-by-step (`/root/reference/src/__main__.py` dispatch); here
it is one lazy DAG.

Shape at scale: the dedup aggregate + its semi-join are the only
corpus-wide shuffles; decontamination is a broadcast shingle join and
everything else is map-side. The 1->N chunk explode runs last so
rejected documents are never tokenized.

The gated frame is persisted before decontamination branches on it
(gram generation vs surviving rows): Catalyst has no cross-branch
common-subexpression elimination, so without it the scan + dedup
shuffle + gate would run twice — the same diamond-DAG fix as
windows.conv_offsets. MEMORY_AND_DISK spills cleanly at corpus scale;
pipelines that materialize stage boundaries anyway (config runner
``save: true``) pay nothing extra.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ml4logs_spark import cache
from ml4logs_spark.operators import dedup, textqa


def curate_corpus(
    docs: DataFrame,
    benchmark: DataFrame,
    min_score: float = 0.5,
    min_tokens: int = 3,
    max_tokens: int = 10_000,
    chunk_tokens: int = 64,
    overlap: int = 8,
    near_threshold: float | None = None,
    span_tokens: int | None = None,
    mix_weights: dict[str, str] | None = None,
    mix_alpha: float | None = None,
    max_dup_bigram_frac: float | None = None,
    gopher: dict | None = None,
) -> DataFrame:
    """documents -> model-ready chunks: mix, dedup, gate, decontaminate,
    scrub, chunk. Returns (doc_id, chunk_idx, chunk_text, n_tokens).

    ``mix_weights`` (source -> hex rate as in textqa.source_mix_sample)
    applies the training-mixture downsample FIRST: it is a deterministic
    per-row predicate (md5-prefix draw + broadcast weight dim), so
    putting it at the scan means rows outside the mixture never reach
    the dedup shuffle — at 100 TB that is the difference between
    shuffling the crawl and shuffling the mixture. Weights are therefore
    defined on the RAW corpus (a doc dropped by the mix can't be a
    dedup survivor); sources absent from the map are dropped.
    ``mix_alpha`` is the alternative policy: temperature-derived rates
    (textqa.temperature_mix_sample, p_s^alpha rebalancing) computed
    from the corpus's own per-source counts — same scan-time predicate
    shape, one extra counting pass for the fit. Mutually exclusive
    with ``mix_weights``.

    ``gopher`` (a kwargs dict for ``textqa.gopher_pass_expr``, ``{}``
    for the paper defaults) adds the non-repetition Gopher rule set —
    word-count / mean-word-length / symbol-ratio / alpha-word /
    stopword rules — as a fused map-side predicate in the same stage
    as the repetition gate and quality filter; like the repetition
    gate it scores post-span text, so it measures what would actually
    be trained on.

    ``max_dup_bigram_frac`` adds the Gopher-style repetition gate:
    docs whose ``textqa.dup_bigram_frac_expr`` (1 - distinct bigrams /
    bigrams, the repeated-phrasing signal) exceeds the ceiling drop
    before the quality gate ever scores them. A pure map-side predicate
    Catalyst fuses into the same stage as the quality filter — the
    chain stays one lazy plan.

    ``near_threshold`` adds a near-duplicate removal stage after exact
    dedup (LSH pairs -> connected components -> one survivor per
    cluster). Unlike the rest of the chain it is inherently iterative
    (the clustering fixpoint runs driver-bounded rounds), so the chain
    is no longer one single lazy plan when enabled — the default None
    keeps the fully-lazy exact-dedup chain.

    ``span_tokens`` adds sub-document span dedup (dedup.span_dedup)
    after the document-level stages: corpus-wide repeated k-token
    spans survive only at their canonical first occurrence, and docs
    whose every block duplicates earlier content drop out before the
    gate ever scores them. Pure Catalyst, so unlike near_threshold it
    keeps the chain one lazy plan."""
    if mix_weights is not None and mix_alpha is not None:
        raise ValueError(
            "mix_weights and mix_alpha are alternative mixing policies — "
            "pass one (explicit per-source rates) or the other "
            "(temperature-derived rates), not both"
        )
    if mix_weights is not None:
        docs = textqa.source_mix_sample(docs, mix_weights)
    if mix_alpha is not None:
        # temperature-derived rates (p_s^alpha rebalancing) instead of
        # hand-written weights; same broadcast-dim + md5-draw predicate
        # at the scan (full_rows keeps it map-side — no re-join), so
        # mixed-out rows never reach the dedup shuffle. The rate FIT
        # costs one extra corpus-count pass, unlike the literal dim.
        docs = textqa.temperature_mix_sample(
            docs, alpha=mix_alpha, full_rows=True
        )
    surv = dedup.exact_dedup(docs)
    if near_threshold is not None:
        # the clustering fixpoint and the final anti-join each consume
        # surv in separate jobs — persist so the scan + dedup shuffle
        # doesn't replay (same diamond-DAG rule as the gated frame).
        # Tracked: looping callers free it via cache.release_all().
        surv = cache.track(surv)
        surv = dedup.near_dup_survivors(surv, near_threshold)
    if span_tokens is not None:
        surv = dedup.span_dedup(surv, span_tokens=span_tokens)
    if max_dup_bigram_frac is not None:
        # gate on post-span text (span dedup rewrites it) so the signal
        # measures what would actually be trained on
        surv = surv.filter(
            textqa.dup_bigram_frac_expr("text") <= F.lit(max_dup_bigram_frac)
        )
    if gopher is not None:
        surv = surv.filter(textqa.gopher_pass_expr(**gopher))
    # keep_cols carries text through the gate in the same map-side
    # select — no join back to the corpus (one less doc_id shuffle)
    good = cache.track(
        textqa.quality_filter(
            surv,
            min_score=min_score,
            min_tokens=min_tokens,
            max_tokens=max_tokens,
            keep_cols=("text",),
        ).select("doc_id", "text")
    )
    clean = dedup.decontaminate(good, benchmark)
    masked = textqa.mask_pii(clean).select(
        "doc_id", F.col("masked_text").alias("text")
    )
    return textqa.chunk_documents(
        masked, chunk_tokens=chunk_tokens, overlap=overlap
    )

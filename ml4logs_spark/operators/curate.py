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


def curate_attrition(
    docs: DataFrame,
    benchmark: DataFrame,
    min_score: float = 0.5,
    min_tokens: int = 3,
    max_tokens: int = 10_000,
    mix_weights: dict[str, str] | None = None,
    max_dup_bigram_frac: float | None = None,
    gopher: dict | None = None,
) -> DataFrame:
    """Per-stage survivor counts for the lazy curation chain — the
    attrition report a data org reads before committing to gate
    thresholds: (stage_idx, stage, n_docs) for raw -> mixed ->
    exact_dedup -> repetition_gate -> gopher_rules -> quality_gate ->
    decontaminated, where each count is "docs still alive after this
    stage" under ``curate_corpus``'s exact stage semantics and
    expressions (the gates share ``dup_bigram_frac_expr`` /
    ``gopher_pass_expr`` / ``_stats_exprs``, so report and chain can
    never drift). Stages not enabled repeat the previous count.

    Shape at scale: NOT one count() per stage (that would rescan the
    corpus seven times). Every gate is a cumulative boolean column in
    ONE wide projection; the only corpus shuffles are the dedup
    winner aggregate + its id join-back, plus the broadcast benchmark
    shingle join for the contamination flag (computed only over
    quality-alive docs) — then a single 1-row sum aggregate, unpivoted
    to the stage rows. The iterative stages (near_threshold /
    span_tokens) are deliberately outside this report: they rewrite
    doc text rather than just filtering rows."""
    from ml4logs_spark.operators.textqa import _norm_rate_hex, _stats_exprs

    if mix_weights is not None:
        norm = {
            src: _norm_rate_hex(rate_hex, what=f"rate for {src!r}")
            for src, rate_hex in mix_weights.items()
        }
        dim = docs.sparkSession.createDataFrame(
            list(norm.items()), "source string, _rate_hex string"
        )
        key = F.concat_ws(
            ":", F.col("source").cast("string"), F.col("doc_id").cast("string")
        )
        wide = docs.join(F.broadcast(dim), "source", "left")
        alive_mix = F.col("_rate_hex").isNotNull() & (
            F.substring(F.md5(key), 1, 4) < F.col("_rate_hex")
        )
    else:
        wide = docs
        alive_mix = F.lit(True)
    wide = dedup.with_text_hash(wide).withColumn("_alive_mix", alive_mix)

    winners = (
        wide.filter("_alive_mix")
        .groupBy("text_hash")
        .agg(F.min("doc_id").alias("doc_id"))
        .select("doc_id", F.lit(True).alias("_is_win"))
    )
    wide = wide.join(winners, "doc_id", "left").withColumn(
        "_alive_dedup", F.col("_alive_mix") & F.coalesce("_is_win", F.lit(False))
    )

    rep_ok = (
        textqa.dup_bigram_frac_expr("text") <= F.lit(max_dup_bigram_frac)
        if max_dup_bigram_frac is not None
        else F.lit(True)
    )
    gopher_ok = (
        textqa.gopher_pass_expr(**gopher) if gopher is not None else F.lit(True)
    )
    wide = wide.withColumn("_alive_rep", F.col("_alive_dedup") & rep_ok)
    wide = wide.withColumn("_alive_gopher", F.col("_alive_rep") & gopher_ok)
    # quality gate over the same _stats_exprs the filter uses
    wide = wide.select("*", *_stats_exprs())
    wide = wide.withColumn(
        "_alive_quality",
        F.col("_alive_gopher")
        & (F.col("quality_score") >= min_score)
        & (F.col("n_tokens") >= min_tokens)
        & (F.col("n_tokens") <= max_tokens),
    )
    # contamination flag only over quality-alive docs (what the chain
    # decontaminates); tracked persist so the dirty-id job doesn't
    # replay the scan + dedup shuffle for the final aggregate
    wide = cache.track(wide)
    good = wide.filter("_alive_quality").select("doc_id", "text")
    dirty = dedup.contaminated_ids(good, benchmark).select(
        "doc_id", F.lit(True).alias("_dirty")
    )
    wide = wide.join(dirty, "doc_id", "left").withColumn(
        "_alive_clean",
        F.col("_alive_quality") & F.col("_dirty").isNull(),
    )

    agg = wide.agg(
        F.count(F.lit(1)).alias("raw"),
        *[
            F.sum(F.col(c).cast("long")).alias(name)
            for c, name in [
                ("_alive_mix", "mixed"),
                ("_alive_dedup", "exact_dedup"),
                ("_alive_rep", "repetition_gate"),
                ("_alive_gopher", "gopher_rules"),
                ("_alive_quality", "quality_gate"),
                ("_alive_clean", "decontaminated"),
            ]
        ],
    )
    stages = [
        "raw", "mixed", "exact_dedup", "repetition_gate",
        "gopher_rules", "quality_gate", "decontaminated",
    ]
    pairs = ", ".join(f"'{s}', {s}" for s in stages)
    return (
        agg.selectExpr(f"stack({len(stages)}, {pairs}) AS (stage, n_docs)")
        .withColumn(
            "stage_idx",
            F.array_position(
                F.array(*[F.lit(s) for s in stages]), F.col("stage")
            ).cast("int"),
        )
        .select("stage_idx", "stage", F.coalesce("n_docs", F.lit(0)).alias("n_docs"))
    )


def curate_transcripts(
    turns: DataFrame,
    min_turns: int = 2,
    max_turns: int = 512,
    max_role_run: int = 4,
    min_user_frac: float = 0.1,
    max_tool_frac: float = 0.6,
    near_threshold: float | None = None,
    branch_min_shared: int | None = None,
    seq_tokens: int = 2048,
) -> DataFrame:
    """The transcript-side curation pipeline as one declarative plan —
    the SFT analog of ``curate_corpus``: raw turns -> conversation
    exact dedup -> (optional) conversation near-dedup -> stutter strip
    (consecutive-duplicate turns) -> conversation quality gate ->
    training-stream packing. This is the step-by-step composition a
    user of the reference would script around its per-block feature
    scripts (`/root/reference/src/__main__.py` dispatch); here Catalyst
    plans the whole chain at once.

    Stage order is deliberate: dedup runs on RAW text (an ingest-level
    identity — a stuttered re-ingest of the same conversation must
    still hash equal to itself before cleaning), while the quality
    gate runs on CLEANED turns (same post-rewrite principle as the
    chain's span/repetition gates — the gate scores what would
    actually be trained on, so a stutter run stripped by cleaning
    no longer trips ``max_role_run``).

    Returns one row per surviving turn with its conversation's
    packing assignment attached: (conv_id, turn_idx, role, tool,
    text, conv_tokens, token_offset, seq_id, seq_pos). ``ts`` is
    dropped — the training stream consumes order, not wall time
    (timedeltas are a separate feature stage).

    ``near_threshold`` adds conversation near-duplicate removal (the
    conv-as-document adapter feeding the proven LSH -> connected
    components -> min-id survivor path). As in ``curate_corpus`` it is
    the one inherently-iterative stage, so the default None keeps the
    chain fully lazy. ``branch_min_shared`` adds branch-stub pruning
    (``conv_branch_survivors``: drop complete conversations that are a
    proper turn-prefix of a longer one — agent retry stubs) right
    after exact dedup, on RAW text for the same ingest-level-identity
    reason; the chain stays lazy (window pass + equi-joins, no
    iteration).

    Shape at scale: the conv hash dedup aggregate + its semi-join, the
    gate aggregate + its semi-join, and the packing prefix sum are the
    only conv_id shuffles; each reuses the same key so AQE coalesces
    them, and the text column travels each shuffle exactly once. Two
    tracked persists break the two diamond nodes (cleaned turns feed
    gate-agg AND the semi-join; gated turns feed pack-agg AND the
    final join) — the same rule as ``curate_corpus``'s gated frame.
    Looping callers free them via ``cache.release_all()``."""
    from ml4logs_spark.operators import windows

    surv = dedup.conv_dedup_survivors(turns)
    if branch_min_shared is not None:
        surv = dedup.conv_branch_survivors(surv, min_shared=branch_min_shared)
    if near_threshold is not None:
        surv = cache.track(surv)
        keep_ids = dedup.near_dup_survivors(
            dedup.conv_text_docs(surv), near_threshold
        ).select(F.col("doc_id").alias("conv_id"))
        surv = surv.join(keep_ids, "conv_id", "left_semi")
    clean = cache.track(windows.dedup_consecutive_turns(surv))
    gate = (
        windows.conv_quality_flags(
            clean,
            min_turns=min_turns,
            max_turns=max_turns,
            max_role_run=max_role_run,
            min_user_frac=min_user_frac,
            max_tool_frac=max_tool_frac,
        )
        .filter("passes")
        .select("conv_id")
    )
    kept = cache.track(clean.join(gate, "conv_id", "left_semi"))
    pack = windows.pack_conversations(kept, seq_tokens=seq_tokens)
    return kept.join(pack, "conv_id").select(
        "conv_id", "turn_idx", "role", "tool", "text",
        "conv_tokens", "token_offset", "seq_id", "seq_pos",
    )


def curate_transcripts_attrition(
    turns: DataFrame,
    min_turns: int = 2,
    max_turns: int = 512,
    max_role_run: int = 4,
    min_user_frac: float = 0.1,
    max_tool_frac: float = 0.6,
) -> DataFrame:
    """Per-stage survivor counts for the transcript curation chain —
    the threshold-tuning report for ``curate_transcripts``: (stage_idx,
    stage, n_convs, n_turns) for raw -> exact_dedup -> stutter_strip ->
    quality_gate, under the chain's exact stage semantics (the gate is
    evaluated on CLEANED turns, stutter rows drop turns but never
    conversations, dedup keeps the min conv_id per canonical hash).

    Shape at scale: NOT one count() per stage. One conv_id window pass
    marks stutter rows and cleaned-sequence role runs, ONE conv-level
    aggregate folds raw/clean turn counts + the gate signals, the
    dedup winner flag joins from the conv-count-sized hash dim, and a
    single 1-row sum unpivots to the stage rows — the corpus text
    travels its shuffle once. As in ``curate_attrition`` the iterative
    stage (near_threshold) is deliberately outside the report."""
    from pyspark.sql import Window

    from ml4logs_spark.operators import windows

    w = windows.w_conv()
    role = F.coalesce(F.col("role"), F.lit(""))
    same_prev = (
        F.lag("turn_idx").over(w).isNotNull()
        & F.col("role").eqNullSafe(F.lag("role").over(w))
        & F.col("tool").eqNullSafe(F.lag("tool").over(w))
        & F.col("text").eqNullSafe(F.lag("text").over(w))
    )
    # run boundaries over the CLEANED sequence: a kept row opens a new
    # run iff the previous KEPT row's role differs — lag over kept rows
    # only, expressed as last_value(ignorenulls) of the kept-row role
    marked = turns.select(
        "conv_id", "turn_idx", role.alias("_role"),
        same_prev.alias("_dup"),
    )
    prev_kept_role = F.last(
        F.when(~F.col("_dup"), F.col("_role")), ignorenulls=True
    ).over(w.rowsBetween(Window.unboundedPreceding, -1))
    boundary = (
        (~F.col("_dup"))
        & (prev_kept_role.isNull() | (prev_kept_role != F.col("_role")))
    ).cast("long")
    with_run = marked.withColumn("_brk", boundary).withColumn(
        "run_id", F.sum("_brk").over(w)
    )
    kept_run_len = F.count(F.when(~F.col("_dup"), F.lit(1))).over(
        Window.partitionBy("conv_id", "run_id")
    )
    per_turn = with_run.withColumn("_rlen", kept_run_len)
    n_clean = F.sum((~F.col("_dup")).cast("long"))
    conv = per_turn.groupBy("conv_id").agg(
        F.count(F.lit(1)).alias("n_raw_turns"),
        n_clean.alias("n_clean_turns"),
        F.max(F.when(~F.col("_dup"), F.col("_rlen"))).cast("long")
            .alias("_max_run"),
        F.round(
            F.sum(F.when(~F.col("_dup") & (F.col("_role") == "user"), 1)
                  .otherwise(0)) / n_clean, 6
        ).alias("_user_frac"),
        F.round(
            F.sum(F.when(~F.col("_dup") & (F.col("_role") == "tool"), 1)
                  .otherwise(0)) / n_clean, 6
        ).alias("_tool_frac"),
        F.min_by(F.col("_role"), F.when(~F.col("_dup"), F.col("turn_idx")))
            .alias("_opening"),
    )
    winners = (
        dedup.conv_hashes(turns)
        .groupBy("conv_hash")
        .agg(F.min("conv_id").alias("conv_id"))
        .select("conv_id", F.lit(True).alias("_is_win"))
    )
    wide = conv.join(winners, "conv_id", "left").select(
        "*",
        F.coalesce("_is_win", F.lit(False)).alias("_alive_dedup"),
    )
    gate_ok = (
        (F.col("n_clean_turns") >= min_turns)
        & (F.col("n_clean_turns") <= max_turns)
        & (F.col("_max_run") <= max_role_run)
        & (F.col("_user_frac") >= min_user_frac)
        & (F.col("_tool_frac") <= max_tool_frac)
        & F.col("_opening").isin("user", "system")
    )
    wide = wide.withColumn("_alive_gate", F.col("_alive_dedup") & gate_ok)
    agg = wide.agg(
        F.count(F.lit(1)).alias("raw_convs"),
        F.sum("n_raw_turns").cast("long").alias("raw_turns"),
        F.sum(F.col("_alive_dedup").cast("long")).alias("dedup_convs"),
        F.sum(F.when(F.col("_alive_dedup"), F.col("n_raw_turns"))
              .otherwise(0)).cast("long").alias("dedup_turns"),
        F.sum(F.when(F.col("_alive_dedup"), F.col("n_clean_turns"))
              .otherwise(0)).cast("long").alias("clean_turns"),
        F.sum(F.col("_alive_gate").cast("long")).alias("gate_convs"),
        F.sum(F.when(F.col("_alive_gate"), F.col("n_clean_turns"))
              .otherwise(0)).cast("long").alias("gate_turns"),
    )
    stages = [
        ("raw", "raw_convs", "raw_turns"),
        ("exact_dedup", "dedup_convs", "dedup_turns"),
        ("stutter_strip", "dedup_convs", "clean_turns"),
        ("quality_gate", "gate_convs", "gate_turns"),
    ]
    pairs = ", ".join(f"'{s}', {c}, {t}" for s, c, t in stages)
    return (
        agg.selectExpr(
            f"stack({len(stages)}, {pairs}) AS (stage, n_convs, n_turns)"
        )
        .withColumn(
            "stage_idx",
            F.array_position(
                F.array(*[F.lit(s) for s, _, _ in stages]), F.col("stage")
            ).cast("int"),
        )
        .select(
            "stage_idx", "stage",
            F.coalesce("n_convs", F.lit(0)).alias("n_convs"),
            F.coalesce("n_turns", F.lit(0)).alias("n_turns"),
        )
    )

"""Aggregate feature stage: count vectors, TF-IDF, scalers (SURVEY.md §2.4).

Reproduces the reference's CountFeatureExtractor semantics
(/root/reference/src/ml4logs/features/count_features.py):

- per-block BOW counts (count_features.py:33-44) -> long-form
  ``groupBy(conv_id, tool, template_id).count()`` — kept long (sparse),
  never pivoted on the hot path: at 10^12 turns a dense (B, E) pivot is
  a memory bomb; long form is the distributed-native sparse matrix.
- idf = ln(B / df) fitted on the train conversations only
  (count_features.py:59-61), persisted as a small dim and broadcast on
  apply (the analog of joblib.dump/load state, aggregate.py:44-58) —
  never refit on the apply split.
- mean-centering / min-max / standardization (count_features.py:64-66,
  transform_features.py:31-60, seq2seq.py:212-216) -> fit aggregates ->
  broadcast join -> projection.

All aggregations are partial+final hash aggregates (Catalyst default):
map-side combine keeps the conv_id shuffle proportional to #groups, not
#rows.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ml4logs_spark.functions.masking import train_split_flag


def conv_tool_counts(parsed: DataFrame) -> DataFrame:
    """Long-form per-(conv_id, tool) template-count vectors (A2).

    ``tool`` nulls (non-tool turns) are kept as their own group — the
    reference counted every line, tool-bearing or not.
    """
    return parsed.groupBy("conv_id", "tool", "template_id").agg(
        F.count(F.lit(1)).alias("cnt")
    )


def fit_idf(counts: DataFrame) -> DataFrame:
    """Fit idf = ln(B / df) on train conversations (count_features.py:59-61).

    B = number of distinct (conv_id) blocks in the fit set; df(template) =
    number of fit blocks where the template occurs at least once.
    Returns the small (template_id, idf) state table.

    Fully lazy: B is a broadcast 1-row aggregate crossed into the df
    table — no driver-side action, so callers can compose/cache freely
    and the whole fit is one job.
    """
    fit = counts.filter(train_split_flag())
    b = fit.agg(F.countDistinct("conv_id").alias("_b"))
    return (
        fit.groupBy("template_id")
        .agg(F.countDistinct("conv_id").alias("df"))
        .crossJoin(F.broadcast(b))
        .select(
            "template_id",
            F.log(F.col("_b").cast("double") / F.col("df")).alias("idf"),
        )
    )


def apply_tfidf(counts: DataFrame, idf: DataFrame) -> DataFrame:
    """tf * idf via broadcast join (count_features.py:62, 78-79).

    Templates unseen at fit time get idf null -> tfidf null, the analog
    of the reference *dropping* unseen-at-fit columns
    (count_features.py:46-49); callers that want the zero-fill analog use
    ``na.fill``. INNER-ness is deliberately avoided: rows survive.
    """
    return counts.join(F.broadcast(idf), "template_id", "left").withColumn(
        "tfidf", F.col("cnt") * F.col("idf")
    )


def _join_stats(df: DataFrame, stats: DataFrame, keys: list[str]) -> DataFrame:
    """Broadcast-join fit statistics; empty keys -> scalar cross join."""
    if keys:
        return df.join(F.broadcast(stats), keys, "left")
    return df.crossJoin(F.broadcast(stats))


def mean_center(df: DataFrame, value_col: str, keys: list[str]) -> DataFrame:
    """Subtract the fit-set per-key mean (count_features.py:64-66, 80-82)."""
    means = df.filter(train_split_flag()).groupBy(*keys).agg(
        F.avg(value_col).alias("_mu")
    )
    return _join_stats(df, means, keys).withColumn(
        f"{value_col}_centered", F.col(value_col) - F.coalesce(F.col("_mu"), F.lit(0.0))
    ).drop("_mu")


def minmax_scale(df: DataFrame, value_col: str, keys: list[str]) -> DataFrame:
    """Clip-to-[0,1] min-max scale, fit on train only
    (/root/reference/src/ml4logs/features/transform_features.py:31-60,
    sklearn MinMaxScaler(clip=True) semantics)."""
    bounds = df.filter(train_split_flag()).groupBy(*keys).agg(
        F.min(value_col).alias("_mn"), F.max(value_col).alias("_mx")
    )
    span = F.col("_mx") - F.col("_mn")
    scaled = F.when(span == 0, F.lit(0.0)).otherwise(
        (F.col(value_col) - F.col("_mn")) / span
    )
    return _join_stats(df, bounds, keys).withColumn(
        f"{value_col}_scaled", F.least(F.greatest(scaled, F.lit(0.0)), F.lit(1.0))
    ).drop("_mn", "_mx")


def standardize(df: DataFrame, value_col: str, keys: list[str]) -> DataFrame:
    """(x - mean) / std with std==0 -> 0, fit on train only
    (/root/reference/src/ml4logs/models/baselines/seq2seq.py:212-216)."""
    stats = df.filter(train_split_flag()).groupBy(*keys).agg(
        F.avg(value_col).alias("_mu"), F.stddev_samp(value_col).alias("_sd")
    )
    z = F.when(
        F.col("_sd").isNull() | (F.col("_sd") == 0), F.lit(0.0)
    ).otherwise((F.col(value_col) - F.col("_mu")) / F.col("_sd"))
    return _join_stats(df, stats, keys).withColumn(
        f"{value_col}_z", z
    ).drop("_mu", "_sd")


def conv_maxpool(turns: DataFrame, value_col: str) -> DataFrame:
    """Per-conversation max-pool of a per-turn feature
    (/root/reference/src/ml4logs/features/aggregate.py:60-68)."""
    return turns.groupBy("conv_id").agg(F.max(value_col).alias(f"max_{value_col}"))


def array_maxpool(df: DataFrame, key: str, vec_col: str, dim: int) -> DataFrame:
    """Element-wise per-group max over an ``array<float>`` column — the
    full A6 semantics: the reference max-pools (N, F) embedding matrices
    per block (/root/reference/src/ml4logs/features/aggregate.py:60-68).

    One hash aggregate with ``dim`` max buffers (JVM-side, partial+final
    combine): the shuffle carries #groups x dim doubles, never the rows.
    That beats posexplode (which would shuffle N x dim rows) and needs no
    Python. ``dim`` is the fixed feature width (model property, known at
    plan time, like the reference's F).
    """
    aggs = [
        F.max(F.element_at(vec_col, i + 1).cast("double")).alias(f"_m{i}")
        for i in range(dim)
    ]
    pooled = df.groupBy(key).agg(*aggs)
    return pooled.select(
        key, F.array(*[F.col(f"_m{i}") for i in range(dim)]).alias(f"max_{vec_col}")
    )


def merge_features(
    a: DataFrame, b: DataFrame, keys: list[str], feat_col: str = "features"
) -> DataFrame:
    """hstack two per-row feature arrays — the full J3 semantics
    (/root/reference/src/ml4logs/data/utils.py:62-77 merges feature
    matrices column-wise under positional alignment).

    Positional alignment is made explicit: an equi-join on the row keys
    (conv_id, turn_idx) then ``F.concat`` of the arrays. Inner join =
    the reference's same-length assert; on the bucketed fact table both
    sides are co-partitioned so the join is shuffle-free.
    """
    fa = a.select(*keys, F.col(feat_col).alias("_fa"))
    fb = b.select(*keys, F.col(feat_col).alias("_fb"))
    return fa.join(fb, keys).select(
        *keys, F.concat("_fa", "_fb").alias(feat_col)
    )


def fit_template_dim(counts: DataFrame) -> DataFrame:
    """Templates seen in the train split — the fit-time column schema
    (count_features.py:33-44 fit vocabulary)."""
    return counts.filter(train_split_flag()).select("template_id").distinct()


def dense_fit_counts(counts: DataFrame) -> DataFrame:
    """Dense (conv x fit-template) zero-filled count matrix in long form.

    The reference's ``_add_missing_columns`` schema-evolution semantics
    (count_features.py:46-49, 72-76): every fit-time template is present
    for every conversation (zero-filled when unseen at transform), and
    templates UNSEEN AT FIT are dropped. The grid is convs x broadcast
    fit-template dim (the dim is model state, small); the observed counts
    left-join onto it. Dense B x E materialization is the reference's
    dense-matrix contract — the hot path keeps the sparse long form
    (conv_tool_counts); use this only at the model boundary.
    """
    convs = counts.select("conv_id").distinct()
    agg = counts.groupBy("conv_id", "template_id").agg(F.sum("cnt").alias("_cnt"))
    grid = convs.crossJoin(F.broadcast(fit_template_dim(counts)))
    return grid.join(agg, ["conv_id", "template_id"], "left").select(
        "conv_id",
        "template_id",
        F.coalesce("_cnt", F.lit(0)).cast("long").alias("cnt"),
    )

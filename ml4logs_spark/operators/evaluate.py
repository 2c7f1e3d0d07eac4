"""Evaluation operators: confusion counts, F1, threshold sweep.

Distributed re-expression of the reference's metric helpers
(/root/reference/src/ml4logs/models/utils.py:57-113): tp/fp/tn/fn are
sums of boolean products; the best-threshold search becomes a crossed
threshold-grid aggregation instead of a Python loop over candidate
thresholds — one shuffle, all thresholds scored at once.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def conv_scores(parsed: DataFrame, labels: DataFrame) -> DataFrame:
    """Per-conversation anomaly score = fraction of error-template turns,
    joined to the label dim (inner: ghost labels drop, reference
    data/hdfs.py:61-62)."""
    score = parsed.groupBy("conv_id").agg(
        (
            F.sum(F.when(F.col("text").like("error code %"), 1).otherwise(0))
            / F.count(F.lit(1))
        ).alias("score")
    )
    return score.join(labels, "conv_id", "inner")


def confusion(scored: DataFrame, threshold: float) -> DataFrame:
    """tp/fp/tn/fn + precision/recall/F1 at one threshold
    (models/utils.py:57-92)."""
    pred = (F.col("score") >= threshold).cast("int")
    y = F.col("label").cast("int")
    agg = scored.agg(
        F.sum(pred * y).alias("tp"),
        F.sum(pred * (1 - y)).alias("fp"),
        F.sum((1 - pred) * y).alias("fn"),
        F.sum((1 - pred) * (1 - y)).alias("tn"),
    )
    prec = F.col("tp") / F.nullif(F.col("tp") + F.col("fp"), F.lit(0))
    rec = F.col("tp") / F.nullif(F.col("tp") + F.col("fn"), F.lit(0))
    return agg.select(
        "tp", "fp", "fn", "tn",
        F.round(prec, 6).alias("precision"),
        F.round(rec, 6).alias("recall"),
        F.round(2 * prec * rec / F.nullif(prec + rec, F.lit(0)), 6).alias("f1"),
    )


def error_threshold(scored: DataFrame) -> DataFrame:
    """Anomaly threshold = mean(score) + 2*std(score) over normal convs
    (/root/reference/src/ml4logs/models/baselines/seq2seq.py:100-110)."""
    normal = scored.filter(~F.col("label"))
    return normal.agg(
        F.round(F.avg("score") + 2 * F.stddev_samp("score"), 6).alias("threshold"),
        F.count(F.lit(1)).alias("n_normal"),
    )


def threshold_sweep(scored: DataFrame, n_grid: int = 20) -> DataFrame:
    """Score a linspace threshold grid in one pass; best F1 first
    (models/utils.py:95-113 + np.linspace grid, seq2seq.py:275).

    The grid (n_grid rows) is crossed with per-conv rows — broadcast
    nested loop join of a tiny side, then a single hash aggregate.
    """
    spark = scored.sparkSession
    grid = spark.range(n_grid + 1).select(
        (F.col("id") / F.lit(float(n_grid))).alias("threshold")
    )
    pred = (F.col("score") >= F.col("threshold")).cast("int")
    y = F.col("label").cast("int")
    agg = scored.crossJoin(F.broadcast(grid)).groupBy("threshold").agg(
        F.sum(pred * y).alias("tp"),
        F.sum(pred * (1 - y)).alias("fp"),
        F.sum((1 - pred) * y).alias("fn"),
    )
    f1 = 2 * F.col("tp") / F.nullif(2 * F.col("tp") + F.col("fp") + F.col("fn"), F.lit(0))
    return agg.select(
        F.round("threshold", 6).alias("threshold"),
        "tp", "fp", "fn",
        F.round(f1, 6).alias("f1"),
    ).orderBy(F.desc_nulls_last("f1"), "threshold")

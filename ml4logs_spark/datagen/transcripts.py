"""Spark-side loaders for the transcripts star schema.

``transcripts(spark, sf_dir)`` returns the lazily-derived fact DataFrame
(schema per BASELINE.json input_hint); ``materialize`` writes it (plus dims
and labels) to repo-local parquet bucketed-by-conv layout for bench runs so
scan cost is realistic and the on-disk row order is deliberately shuffled —
stable ordering must come from the (conv_id, turn_idx) window, never file
order (the reference leaned on file order: /root/reference/src/ml4logs/
data/hdfs.py:131-136; that invariant does not survive distribution).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ml4logs_spark.datagen import derivation

TRANSCRIPT_COLS = ["conv_id", "turn_idx", "role", "text", "tool", "ts"]


def _events_ref(sf_dir: str) -> str:
    return f"parquet.`{sf_dir}/events.parquet`"


def transcripts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Derive the transcripts fact table from the events table."""
    return spark.sql(derivation.transcripts_sql(_events_ref(sf_dir)))


def role_dim(spark: SparkSession) -> DataFrame:
    return spark.sql(derivation.ROLE_DIM_SQL)


def tool_dim(spark: SparkSession) -> DataFrame:
    return spark.sql(derivation.TOOL_DIM_SQL)


def labels(spark: SparkSession, sf_dir: str) -> DataFrame:
    return spark.sql(derivation.labels_sql(_events_ref(sf_dir)))


def materialize(spark: SparkSession, sf_dir: str, out_dir: str, buckets: int = 32) -> str:
    """Write transcripts + dims as parquet under out_dir; returns out_dir.

    Rows are hash-distributed (repartition on conv_id hash + a shuffled
    in-file order) so no stage can accidentally rely on disk order.
    """
    os.makedirs(out_dir, exist_ok=True)
    t = transcripts(spark, sf_dir)
    # Shuffle on-disk order deterministically: distribute by hash of the
    # full key, sort within partitions by a decorrelated hash.
    (
        t.repartition(buckets, F.crc32(F.col("conv_id")))
        .sortWithinPartitions(F.crc32(F.concat_ws("#", "conv_id", F.col("turn_idx").cast("string"))))
        .write.mode("overwrite")
        .parquet(f"{out_dir}/transcripts.parquet")
    )
    role_dim(spark).coalesce(1).write.mode("overwrite").parquet(f"{out_dir}/role_dim.parquet")
    tool_dim(spark).coalesce(1).write.mode("overwrite").parquet(f"{out_dir}/tool_dim.parquet")
    labels(spark, sf_dir).coalesce(1).write.mode("overwrite").parquet(f"{out_dir}/labels.parquet")
    return out_dir


def read_materialized(spark: SparkSession, out_dir: str) -> DataFrame:
    return spark.read.parquet(f"{out_dir}/transcripts.parquet")


def replicate(t: DataFrame, k: int) -> DataFrame:
    """Deterministically scale the fact table k-fold for bench runs.

    Each replica keeps per-conversation structure (same turns, same ts)
    under a suffixed conv_id — the conversation count grows k-fold, the
    per-conv size distribution (and the planted skew) is preserved.
    """
    if k <= 1:
        return t
    spark = t.sparkSession
    reps = spark.range(k).select(F.col("id").alias("_rep"))
    return t.crossJoin(F.broadcast(reps)).select(
        F.concat_ws("-r", F.col("conv_id"), F.col("_rep").cast("string")).alias("conv_id"),
        "turn_idx", "role", "text", "tool", "ts",
    )

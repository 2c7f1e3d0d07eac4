"""Route stage: skew-defused fan-out to (template_bucket, role) sinks.

The reference fans blocks out to per-split log files in a Python loop
(/root/reference/src/ml4logs/data/hdfs.py:43-50, 70-74, 99-104); here a
single pass computes the sink key and one partitioned write commits every
sink atomically — no per-sink scan.

Skew handling (explicit per the north rule, not AQE-only):
- conversations are salted: ``repartition(P, conv_id, salt)`` where
  salt = pmod(hash(turn_idx), SALT_BUCKETS). Per-turn stages (parse,
  enrich, route) are embarrassingly parallel in turns, so splitting a
  giant conversation across SALT_BUCKETS tasks is semantics-preserving.
- stages that need per-conversation state (windows, per-conv aggs) use
  the unsalted conv_id exchange; their per-row O(1) window state keeps
  the giant conversation from OOMing a task, and AQE skew-join splitting
  covers the join side.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

SALT_BUCKETS = 16
TEMPLATE_BUCKETS = 8


def with_sink_key(parsed: DataFrame) -> DataFrame:
    """sink_key = (template_bucket, role); bucket = template_id % 8."""
    return parsed.withColumn(
        "template_bucket", F.pmod(F.col("template_id"), F.lit(TEMPLATE_BUCKETS))
    ).withColumn(
        "sink_key",
        F.concat_ws("/", F.col("template_bucket").cast("string"), F.col("role")),
    )


def salted(df: DataFrame, partitions: int | None = None) -> DataFrame:
    """Explicit salted repartition for per-turn stages."""
    salt = F.pmod(F.hash("turn_idx"), F.lit(SALT_BUCKETS))
    if partitions:
        return df.repartition(partitions, F.col("conv_id"), salt)
    return df.repartition(F.col("conv_id"), salt)


def route_write(parsed: DataFrame, out_dir: str, mode: str = "overwrite") -> None:
    """One-pass fan-out write partitioned by sink key.

    At cluster scale this is an Iceberg ``writeTo(...).append`` with the
    same partition spec (see sources/tables.py for the format seam); the
    directory-partitioned parquet layout is the offline fallback.

    The pre-write exchange is salted: repartitioning on the sink key
    alone (32 distinct values) would pin each sink to ONE task — the
    biggest sink becomes the straggler. Salting by hashed (conv_id,
    turn_idx) spreads every sink over SALT_BUCKETS tasks while
    partitionBy still lays out one directory per sink.
    """
    salt = F.pmod(F.hash("conv_id", "turn_idx"), F.lit(SALT_BUCKETS))
    (
        with_sink_key(parsed)
        .repartition(F.col("template_bucket"), F.col("role"), salt)
        .write.mode(mode)
        .partitionBy("template_bucket", "role")
        .parquet(out_dir)
    )


def sink_counts(parsed: DataFrame) -> DataFrame:
    """Per-sink aggregate counts — the correctness invariant the driver
    checks (north rule: 'matching the reference's per-sink aggregate
    counts')."""
    return with_sink_key(parsed).groupBy("template_bucket", "role").agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.countDistinct("conv_id").alias("n_convs"),
    )

"""Streaming fan-out route sink: parse -> enrich-lite -> partitioned
append sink with checkpointed exactly-once progress.

The streaming form of operators/route.py: turns stream in, each is
template-matched against the broadcast static dim, and rows land in the
(template_bucket, role)-partitioned table — the Iceberg-sink analog —
via a checkpointed file sink. Restarting with the same checkpoint
resumes from the last committed micro-batch: already-processed input
files are not re-emitted (Spark's file-source + file-sink exactly-once
contract), which is the streaming counterpart of the batch manifest
resume (sources/manifest.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ml4logs_spark.functions.masking import mask_text


def routed_stream(stream: DataFrame, template_dim: DataFrame) -> DataFrame:
    """Assign template_id/bucket on the stream (static broadcast dim)."""
    parsed = stream.withColumn("template", mask_text()).join(
        F.broadcast(template_dim.select("template_id", "template")),
        "template",
        "left",
    )
    return parsed.withColumn(
        "template_bucket",
        F.pmod(F.coalesce(F.col("template_id"), F.lit(0)), F.lit(8)).cast("int"),
    ).select(
        "conv_id", "turn_idx", "role", "text", "tool", "ts",
        "template_id", "template_bucket",
    )


def start_route_sink(
    stream: DataFrame,
    template_dim: DataFrame,
    out_dir: str,
    checkpoint_dir: str,
):
    """Start the checkpointed fan-out writer (availableNow drain)."""
    routed = routed_stream(stream, template_dim)
    return (
        routed.writeStream.format("parquet")
        .partitionBy("template_bucket", "role")
        .option("path", out_dir)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )

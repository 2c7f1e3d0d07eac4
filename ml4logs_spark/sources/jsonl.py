"""JSONL transcript source — the interchange format conversation logs
actually arrive in (one JSON object per turn).

Schema is EXPLICIT (input_hint shape), never inferred: schema inference
is an extra full scan at 10^12 rows and silently widens types on dirty
data. Timestamps accept ISO-8601 strings; unknown keys in the JSON are
ignored by the reader (permissive ingest), missing keys become null.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

JSONL_SCHEMA = T.StructType([
    T.StructField("conv_id", T.StringType()),
    T.StructField("turn_idx", T.IntegerType()),
    T.StructField("role", T.StringType()),
    T.StructField("text", T.StringType()),
    T.StructField("tool", T.StringType()),
    T.StructField("ts", T.StringType()),  # ISO-8601; parsed below
])


def read_jsonl_transcripts(spark: SparkSession, path: str) -> DataFrame:
    raw = spark.read.schema(JSONL_SCHEMA).json(path)
    return raw.select(
        "conv_id",
        "turn_idx",
        "role",
        "text",
        "tool",
        F.to_timestamp("ts").alias("ts"),
    )

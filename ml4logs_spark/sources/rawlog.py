"""Raw log-file source: the reference's real input format.

A user of ml4logs feeds raw HDFS/BGL log text; this source reproduces
that path Spark-side so they can switch engines without changing inputs:

- label/body split ``line.split(maxsplit=1)`` with '-' = normal
  (/root/reference/src/ml4logs/data/prepare.py:54-73, P1) ->
  ``F.split(line, ' ', 2)`` projection;
- block-id extraction ``re.search(r'(blk_-?\\d+)')``
  (/root/reference/src/ml4logs/data/hdfs.py:128-129, P3) ->
  ``F.regexp_extract`` (Catalyst);
- timestamp prefix ``%y%m%d %H%M%S``
  (/root/reference/src/ml4logs/features/extract_timedeltas.py:54-63,
  P4) -> ``F.to_timestamp(F.regexp_extract(...))``;
- implicit file line order -> explicit per-block ``turn_idx`` via
  row_number over the global line offset (the reference's load-bearing
  positional key made explicit, SURVEY.md §1.1).

Everything is a single projection over ``spark.read.text`` — schema-on-
read at scan speed, no Python.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

BLOCK_RE = r"(blk_-?\d+)"
TS_RE = r"^(\d{6} \d{6})"


def read_hdfs_log(
    spark: SparkSession,
    path: str,
    labeled: bool = False,
) -> DataFrame:
    """Parse raw HDFS-style log lines into the transcripts shape.

    Output: (conv_id=block id, turn_idx=in-block line order, role=label
    marker ('anomaly'/'normal') if ``labeled`` else component, text=the
    line body, tool=component, ts=parsed timestamp).
    """
    lines = (
        spark.read.text(path)
        .select(
            F.monotonically_increasing_id().alias("_off"),
            F.trim(F.col("value")).alias("line"),
        )
        .filter(F.col("line") != "")
    )
    if labeled:
        # "<label> <body>" with '-' = normal (prepare.py:54-73)
        split = F.split(F.col("line"), " ", 2)
        lines = lines.select(
            "_off",
            F.when(split.getItem(0) == "-", "normal").otherwise("anomaly").alias("role"),
            split.getItem(1).alias("line"),
        )
    else:
        lines = lines.withColumn("role", F.lit("line"))

    parsed = lines.select(
        "_off",
        "role",
        F.regexp_extract("line", BLOCK_RE, 1).alias("conv_id"),
        F.to_timestamp(F.regexp_extract("line", TS_RE, 1), "yyMMdd HHmmss").alias("ts"),
        F.regexp_extract("line", r"^\d{6} \d{6} \d+ [A-Z]+ ([^:]+):", 1).alias("tool"),
        F.regexp_extract("line", r"^[^:]*: (.*)$", 1).alias("text"),
    ).filter(F.col("conv_id") != "")

    w = Window.partitionBy("conv_id").orderBy("_off")
    return parsed.select(
        "conv_id",
        (F.row_number().over(w) - 1).cast("int").alias("turn_idx"),
        "role",
        "text",
        F.nullif("tool", F.lit("")).alias("tool"),
        "ts",
    )


def read_labels_csv(spark: SparkSession, path: str) -> DataFrame:
    """labels.csv scan with 'Anomaly'/'Normal' -> boolean
    (/root/reference/src/ml4logs/data/hdfs.py:120-123, S4)."""
    raw = spark.read.option("header", True).csv(path)
    return raw.select(
        F.col("BlockId").alias("conv_id"),
        (F.col("Label") == "Anomaly").alias("label"),
    )

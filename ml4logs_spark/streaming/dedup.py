"""Streaming deduplication over a transcript/document stream.

The batch dedup family (operators/dedup.py) re-expressed for Structured
Streaming — the shape an ingestion pipeline needs when the corpus
arrives continuously:

- ``stream_exact_dedup``: content-hash dedup via
  ``dropDuplicates`` on md5(text) with an event-time watermark bounding
  the dedup state (the streaming analog of the one-shuffle batch
  hash-groupBy; state is keyed by the uniform digest, so no skew).
- ``stream_first_seen_counts``: per-bucket counts of first-seen
  (deduplicated) rows — the dedup-then-aggregate composition.

Watermark semantics: a duplicate arriving within the watermark horizon
of its original is dropped; beyond it the state has been reclaimed and
the row is treated as new — the standard bounded-state tradeoff
(exactly what Spark's streaming dedup guarantees; unbounded exactness
requires the batch pass).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def stream_exact_dedup(stream: DataFrame, watermark: str = "1 hour") -> DataFrame:
    """First occurrence of each text survives; later duplicates within
    the watermark horizon are dropped. Map-side hash + keyed state.

    Uses ``dropDuplicatesWithinWatermark`` (Spark 3.5+), which evicts a
    key's state once the watermark passes its event time — the bounded
    state / horizon contract documented above. Plain
    ``dropDuplicates([key])`` with the event-time column NOT in the key
    subset never evicts: state grows without bound and far-apart
    duplicates are dropped forever instead of treated as new.
    """
    hashed = stream.withColumn("text_hash", F.md5(F.coalesce("text", F.lit(""))))
    return hashed.withWatermark("ts", watermark).dropDuplicatesWithinWatermark(
        ["text_hash"]
    )


def stream_first_seen_counts(
    stream: DataFrame, watermark: str = "1 hour", window: str = "1 hour"
) -> DataFrame:
    """Windowed counts of unique-content turns (dedup -> aggregate)."""
    deduped = stream_exact_dedup(stream, watermark)
    return (
        deduped.groupBy(F.window("ts", window).alias("w"), "role")
        .agg(F.count(F.lit(1)).alias("n_unique"))
        .select(F.col("w.start").alias("window_start"), "role", "n_unique")
    )

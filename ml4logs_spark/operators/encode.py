"""Embedding production: per-turn sentence vectors via pandas UDF (F2).

The reference computes per-line fastText sentence vectors by model
inference (/root/reference/src/ml4logs/features/fasttext.py:44-52): load
a trained model once, then ``model.get_sentence_vector(line)`` per line.
Re-expressed Spark-first as an **iterator-of-batches pandas UDF**:

- the encoder is constructed ONCE per executor task (outside the batch
  loop) — the Spark analog of the reference's single model load; a real
  model (fastText / sentence-transformers) plugs in via
  ``encoder_factory`` without touching the plan;
- batches stream through Arrow; the UDF is map-only (no shuffle), so at
  10^12 turns the encode stage scales with input splits.

The default ``HashEncoder`` is a deterministic STUB standing in for real
model inference (no model libs in this container): dim values are md5
projections of the text, so the output is reproducible in ANSI SQL and
the whole plumbing is oracle-checkable (query ``turn_embeddings``). Its
per-row md5 is placeholder cost — a real encoder replaces it with batch
inference over ``batch.tolist()``, which is where the vectorization
lives.
"""

from __future__ import annotations

import hashlib
from collections.abc import Callable, Iterator

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

DEFAULT_DIM = 8


class HashEncoder:
    """Deterministic stub encoder: v_i = int(md5(f"{text}:{i}")[:4], 16)
    / 65535 - 0.5. Mirrors exactly in DuckDB (see oracle/sql.py
    turn_embeddings), so the UDF seam itself is correctness-gated."""

    def __init__(self, dim: int):
        self.dim = dim

    def encode_batch(self, texts: list[str]) -> list[list[float]]:
        out = []
        for t in texts:
            t = t or ""
            out.append([
                int(hashlib.md5(f"{t}:{i}".encode()).hexdigest()[:4], 16)
                / 65535.0
                - 0.5
                for i in range(self.dim)
            ])
        return out


def make_encode_udf(
    dim: int = DEFAULT_DIM,
    encoder_factory: Callable[[], object] | None = None,
):
    """Arrow-batched ``pandas_udf`` returning ``array<double>``.

    ``encoder_factory`` runs once per executor task (model load); the
    batch loop only calls ``encode_batch`` — identical structure to
    fasttext.py:44-52 but distributed.
    """
    factory = encoder_factory or (lambda: HashEncoder(dim))

    @F.pandas_udf(T.ArrayType(T.DoubleType()))
    def encode(batches: Iterator[pd.Series]) -> Iterator[pd.Series]:
        model = factory()  # once per task, NOT per batch/row
        for batch in batches:
            yield pd.Series(model.encode_batch(batch.tolist()))

    return encode


def turn_embeddings(
    turns: DataFrame,
    dim: int = DEFAULT_DIM,
    text_col: str = "text",
    encoder_factory: Callable[[], object] | None = None,
) -> DataFrame:
    """(conv_id, turn_idx, embedding array<double>) — embeddings.parquet
    shape, produced (not just consumed) by the engine."""
    enc = make_encode_udf(dim, encoder_factory)
    return turns.select("conv_id", "turn_idx", enc(F.col(text_col)).alias("embedding"))

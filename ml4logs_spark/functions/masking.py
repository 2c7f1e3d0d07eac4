"""Shared Catalyst column expressions.

These are the pure-expression building blocks of the parse stage: they run
JVM-side inside whole-stage codegen (no Python). The dynamic-template path
(mined templates -> vectorized regex match) lives in operators/drain.py.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def mask_text(col: str | Column = "text") -> Column:
    """Digit-run masking -> the static template of a turn.

    The Catalyst analog of the reference's Drain content preprocessing
    (/root/reference/src/ml4logs/features/parser/ibm_drain.py:42-43):
    variable slots (ids, counts, codes) collapse to ``<*>``, leaving the
    constant template text. Spark regexp_replace is replace-all.
    """
    c = F.col(col) if isinstance(col, str) else col
    return F.regexp_replace(c, r"[0-9]+", "<*>")


def train_split_flag(conv_col: str = "conv_id") -> Column:
    """Deterministic ~75% fit/apply split by conversation.

    Mirrors the reference's fit-on-train / apply-on-rest statistics reuse
    (/root/reference/src/ml4logs/features/count_features.py:51-83) without
    random state: a conversation is in the fit set iff the first hex digit
    of md5(conv_id) is in 0..b (12/16). md5 is identical in Spark and
    DuckDB, so the oracle can reproduce the split exactly.
    """
    return F.substring(F.md5(F.col(conv_col)), 1, 1) <= "b"

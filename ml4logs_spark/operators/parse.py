"""Parse stage: per-turn template extraction + template dimension.

Re-expresses the reference's Drain parse step (/root/reference/src/
ml4logs/features/parser/ibm_drain.py:40-68):

- the per-line ``content`` regex pre-clean (ibm_drain.py:42-43) ->
  :func:`ml4logs_spark.functions.mask_text`, pure Catalyst;
- the per-line stateful ``template_miner.add_log_message`` update
  (ibm_drain.py:44-45) -> the fit/apply split in operators/drain.py; on
  this corpus the mined templates coincide with digit-masking, so the
  hot path stays JVM-side;
- the cluster_id -> dense event_id factorization dict (ibm_drain.py:
  49-55, 67) -> a template dimension table with ``dense_rank`` ids,
  broadcast-hash-joined back to turns (the reference's dict lookup IS a
  broadcast join).

Scale notes: template_dim is tiny (#distinct templates), so the
turn->template_id assignment is a broadcast join — no shuffle of the
fact table. The dim itself needs one shuffle over distinct templates,
whose cardinality is bounded by the grammar, not the row count; partial
aggregation makes the map-side output tiny.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ml4logs_spark.functions.masking import mask_text


def with_template(turns: DataFrame, text_col: str = "text") -> DataFrame:
    """Append the masked ``template`` column (JVM-side, codegen)."""
    return turns.withColumn("template", mask_text(text_col))


def template_dim(turns: DataFrame) -> DataFrame:
    """Template dimension: (template_id, template, occurrences).

    The analog of ibm_drain-templates.csv (ibm_drain.py:58-61). Ids are
    ``dense_rank`` over template text — deterministic under any
    parallelism (the reference's first-seen factorization order is an
    artifact of single-threaded execution; SURVEY.md §2.5 W4 documents
    the deliberate change to a stable order).
    """
    agg = with_template(turns).groupBy("template").agg(F.count(F.lit(1)).alias("occurrences"))
    # Single-partition ranking is DELIBERATE and bounded: the input is
    # already collapsed to #templates rows (grammar-bounded, tiny). The
    # constant partition key marks that intent and suppresses the
    # accidental-global-window warning reserved for data-proportional
    # inputs; it must be NON-FOLDABLE (a literal would be optimized away,
    # restoring the empty partition spec) — an empty substring of a real
    # column is constant per row but opaque to constant folding.
    w = Window.partitionBy(F.substring("template", 1, 0)).orderBy("template")
    return agg.select(
        F.dense_rank().over(w).cast("long").alias("template_id"),
        "template",
        "occurrences",
    )


def parsed_turns(turns: DataFrame, dim: DataFrame | None = None) -> DataFrame:
    """Turns enriched with template_id via broadcast hash join (J1)."""
    dim = dim if dim is not None else template_dim(turns)
    return with_template(turns).join(
        F.broadcast(dim.select("template_id", "template")), "template", "inner"
    )

"""Derivation invariants + edge-case fixtures (FIXTURES.md §1, §6)."""

import pandas as pd
from pyspark.sql import functions as F

from tests.conftest import SF_DIR


def test_schema(turns):
    assert turns.schema.simpleString() == (
        "struct<conv_id:string,turn_idx:int,role:string,text:string,"
        "tool:string,ts:timestamp>"
    )


def test_turn_idx_dense_unique(turns_pdf):
    # turn_idx is 0..n-1 dense within each conversation — the explicit
    # replacement for the reference's implicit line order
    # (/root/reference/src/ml4logs/data/hdfs.py:131-136).
    for conv, g in turns_pdf.groupby("conv_id"):
        idx = sorted(g["turn_idx"])
        assert idx == list(range(len(g))), conv


def test_deterministic(spark, turns_pdf):
    from ml4logs_spark.datagen import transcripts as tx

    again = tx.transcripts(spark, SF_DIR).toPandas()
    key = ["conv_id", "turn_idx"]
    a = turns_pdf.sort_values(key).reset_index(drop=True)
    b = again.sort_values(key).reset_index(drop=True)
    pd.testing.assert_frame_equal(a, b)


def test_skew_fixture_giant_conversation(turns_pdf):
    # every 10th user merges into conv-00000000; at sf0.001 that's 2
    # users (~2x median), growing to ~10x at sf0.01+ — assert it is the
    # largest conversation by a clear margin.
    sizes = turns_pdf.groupby("conv_id").size()
    assert sizes.idxmax() == "conv-00000000"
    assert sizes["conv-00000000"] > 1.9 * sizes.median()


def test_single_turn_conversation_fixture(turns_pdf):
    assert (turns_pdf.conv_id == "conv-sing0001").sum() == 1


def test_duplicate_ts_fixture(turns_pdf):
    g = turns_pdf[turns_pdf.conv_id == "conv-dupts001"].sort_values("turn_idx")
    assert list(g.turn_idx) == [0, 1, 2]
    assert g.ts.iloc[0] == g.ts.iloc[1]  # ordering must come from turn_idx


def test_null_tool_and_empty_text_fixtures(turns_pdf):
    assert turns_pdf.tool.isna().any()
    assert (turns_pdf.text == "").any()


def test_labels_ghost_convs(spark):
    from ml4logs_spark.datagen import transcripts as tx

    lab = tx.labels(spark, SF_DIR).toPandas()
    ghosts = {"conv-ghost001", "conv-ghost002"}
    assert ghosts <= set(lab.conv_id)


def test_semi_join_drops_nothing_but_ghosts(spark, turns):
    from ml4logs_spark.datagen import transcripts as tx
    from ml4logs_spark.operators.enrich import filter_known_convs

    kept = filter_known_convs(turns, tx.labels(spark, SF_DIR))
    # every conversation is labeled, so the semi join keeps all turns;
    # ghost label rows never materialize rows (data/hdfs.py:61-62 analog)
    assert kept.count() == turns.count()


def test_replicate_preserves_structure(spark, turns):
    from ml4logs_spark.datagen import transcripts as tx

    r = tx.replicate(turns, 3)
    assert r.count() == 3 * turns.count()
    per_rep = (
        r.withColumn("rep", F.substring_index("conv_id", "-r", -1))
        .groupBy("rep").count().toPandas()
    )
    assert set(per_rep["count"]) == {turns.count()}

"""Config-driven dispatch parity (reference __main__.py:20-51 UX)."""

import pytest

from ml4logs_spark.plans.config_runner import run_config, validate_config
from tests.conftest import SF_DIR


def test_config_pipeline_end_to_end(spark, tmp_path):
    cfg = {
        "input": SF_DIR,
        "warehouse": str(tmp_path / "wh"),
        "pipeline": [
            {"action": "transcripts"},
            {"action": "template_dim", "save": True},
            {"action": "parse"},
            {"action": "counts"},
            {"action": "tfidf", "save": True},
            {"action": "timedeltas", "save": True},
        ],
    }
    result = run_config(spark, cfg)
    assert result["template_dim"] > 0
    assert result["tfidf"] > 0 and result["timedeltas"] > 0
    # saved tfidf table equals the direct operator composition
    from ml4logs_spark.datagen import transcripts as tx
    from ml4logs_spark.operators import features as feat, parse

    t = tx.transcripts(spark, SF_DIR)
    counts = feat.conv_tool_counts(parse.parsed_turns(t))
    direct = feat.apply_tfidf(counts, feat.fit_idf(counts))
    assert result["tfidf"] == direct.count()
    saved = spark.read.parquet(str(tmp_path / "wh" / "tfidf"))
    key = ["conv_id", "tool", "template_id"]
    a = saved.toPandas().fillna(-1).sort_values(key).reset_index(drop=True)
    b = direct.toPandas().fillna(-1).sort_values(key).reset_index(drop=True)
    assert (a.cnt.values == b.cnt.values).all()


def test_config_skip_and_unknown_action(spark, tmp_path):
    cfg = {
        "input": SF_DIR,
        "warehouse": str(tmp_path / "wh2"),
        "pipeline": [
            {"action": "transcripts"},
            {"action": "timedeltas", "skip": True},
        ],
    }
    result = run_config(spark, cfg)
    assert result["timedeltas"] == "skipped"

    with pytest.raises(ValueError, match="unknown action"):
        validate_config({"pipeline": [{"action": "not_a_step"}]})
    with pytest.raises(ValueError, match="pipeline"):
        validate_config({})

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


def test_export_and_jsonl_roundtrip(spark, turns, tmp_path):
    """export(json) -> read_jsonl_transcripts is a lossless roundtrip of
    the fact table (csv export covered for a flat aggregate)."""
    from ml4logs_spark.sources.jsonl import read_jsonl_transcripts
    from ml4logs_spark.sources.tables import Warehouse
    from pyspark.sql import functions as F

    wh = Warehouse(spark, str(tmp_path / "wh3"))
    sample = turns.limit(200)
    p = wh.export(
        sample.withColumn("ts", F.date_format("ts", "yyyy-MM-dd'T'HH:mm:ss.SSSSSS")),
        "transcripts", fmt="json",
    )
    back = read_jsonl_transcripts(spark, p)
    key = ["conv_id", "turn_idx"]
    a = sample.select("conv_id", "turn_idx", "text", F.unix_micros("ts").alias("us")) \
        .toPandas().sort_values(key).reset_index(drop=True)
    b = back.select("conv_id", "turn_idx", "text", F.unix_micros("ts").alias("us")) \
        .toPandas().sort_values(key).reset_index(drop=True)
    assert len(a) == len(b) == 200
    assert (a.us.values == b.us.values).all()
    assert (a.text.values == b.text.values).all()

    # csv export of a flat aggregate reads back with identical counts
    agg = sample.groupBy("role").count()
    p2 = wh.export(agg, "role_counts", fmt="csv")
    back2 = spark.read.option("header", True).csv(p2)
    assert back2.count() == agg.count()


def test_config_documents_curation_path(spark, tmp_path):
    cfg = {
        "input": SF_DIR,
        "warehouse": str(tmp_path / "whd"),
        "pipeline": [
            {"action": "documents"},
            {"action": "dedup_exact", "save": True},
            {"action": "doc_stats", "save": True},
            {"action": "near_dups", "threshold": 0.8, "save": True},
        ],
    }
    result = run_config(spark, cfg)
    assert result["doc_stats"] > 0 and result["dedup_exact"] > 0
    assert isinstance(result["near_dups"], int)


def test_config_curate_action(spark, tmp_path):
    cfg = {
        "input": SF_DIR,
        "warehouse": str(tmp_path / "whc"),
        "pipeline": [
            {"action": "documents"},
            {"action": "curate", "min_score": 0.0, "min_tokens": 1,
             "chunk_tokens": 32, "overlap": 4, "save": True,
             "out": "curated_chunks"},
        ],
    }
    result = run_config(spark, cfg)
    assert result["curated_chunks"] > 0
    saved = spark.read.parquet(str(tmp_path / "whc" / "curated_chunks"))
    assert set(saved.columns) == {"doc_id", "chunk_idx", "chunk_text", "n_tokens"}


def test_config_near_dup_survivors_and_source_mix(spark, tmp_path):
    cfg = {
        "input": SF_DIR,
        "warehouse": str(tmp_path / "whm"),
        "pipeline": [
            {"action": "documents"},
            {"action": "near_dup_survivors", "threshold": 0.8, "save": True},
            {"action": "source_mix",
             "from": "near_dup_survivors",
             "weights": {f"src{i}": "80" for i in range(20)},
             "save": True},
        ],
    }
    result = run_config(spark, cfg)
    assert 0 < result["near_dup_survivors"] <= 500
    # ~50% draw over the survivors
    assert 0 < result["source_mix"] < result["near_dup_survivors"]


def test_config_span_dedup_and_corpus_stats(spark, tmp_path):
    cfg = {
        "input": SF_DIR,
        "warehouse": str(tmp_path / "whs"),
        "pipeline": [
            {"action": "documents"},
            {"action": "span_dedup", "span_tokens": 16, "save": True},
            {"action": "length_histogram", "from": "documents", "save": True},
            {"action": "top_ngrams", "from": "documents", "k": 3, "save": True},
        ],
    }
    result = run_config(spark, cfg)
    assert 0 < result["span_dedup"] <= 500
    assert result["length_histogram"] > 0
    assert result["top_ngrams"] > 0


def test_config_packing_split_boilerplate(spark, tmp_path):
    cfg = {
        "input": SF_DIR,
        "warehouse": str(tmp_path / "whs"),
        "pipeline": [
            {"action": "documents"},
            {"action": "pack_sequences", "from": "documents",
             "chunk_tokens": 32, "overlap": 4, "seq_tokens": 128,
             "save": True},
            {"action": "boilerplate_filter", "from": "documents",
             "max_doc_freq": 2, "save": True},
            {"action": "dataset_split", "from": "documents", "save": True},
        ],
    }
    result = run_config(spark, cfg)
    assert result["pack_sequences"] > 0
    assert 0 < result["boilerplate_filter"] <= 500
    assert result["dataset_split"] == 500


def test_config_quality_models(spark, tmp_path):
    """The batch-5 quality-model actions wire through the runner:
    NB split-classify, perplexity tiers, KL skew, bigram scores."""
    cfg = {
        "input": SF_DIR,
        "warehouse": str(tmp_path / "whq"),
        "pipeline": [
            {"action": "documents"},
            {"action": "nb_classify", "from": "documents", "save": True},
            {"action": "perplexity_buckets", "from": "documents",
             "n_buckets": 4, "save": True},
            {"action": "source_kl", "from": "documents", "save": True},
            {"action": "bigram_logprob", "from": "documents", "save": True},
            {"action": "bigram_novelty", "from": "documents", "save": True},
        ],
    }
    result = run_config(spark, cfg)
    assert result["nb_classify"] == 250  # odd half
    assert result["perplexity_buckets"] == 500
    assert result["source_kl"] == 20
    assert result["bigram_logprob"] == 500
    assert result["bigram_novelty"] == 500


def test_run_pipeline_cli_smoke(tmp_path):
    """The spark-submit entry point (jobs/run_pipeline.py) runs end to
    end as its own process and prints the metrics JSON contract."""
    import json
    import subprocess
    import sys
    from pathlib import Path

    repo = Path(__file__).resolve().parent.parent
    proc = subprocess.run(
        [sys.executable, "jobs/run_pipeline.py",
         "--input", SF_DIR, "--warehouse", str(tmp_path / "wh"),
         "--cores", "4"],
        capture_output=True, text=True, cwd=repo, timeout=300,
    )
    assert proc.returncode == 0, proc.stderr[-2000:]
    out = json.loads(proc.stdout.strip().splitlines()[-1])
    assert out["routed_turns"] > 0
    assert out["stages_ran"] and out["turns_per_sec"] > 0


def test_run_config_cli_smoke(tmp_path):
    """The config-driven CLI (the reference's `python -m ml4logs
    <config.json>` UX) runs a shipped-style config end to end."""
    import json
    import subprocess
    import sys
    from pathlib import Path

    repo = Path(__file__).resolve().parent.parent
    cfg = {
        "input": SF_DIR,
        "warehouse": str(tmp_path / "wh"),
        "pipeline": [
            {"action": "documents"},
            {"action": "doc_stats", "save": True},
        ],
    }
    cfg_path = tmp_path / "cfg.json"
    cfg_path.write_text(json.dumps(cfg))
    proc = subprocess.run(
        [sys.executable, "jobs/run_config.py", str(cfg_path)],
        capture_output=True, text=True, cwd=repo, timeout=300,
    )
    assert proc.returncode == 0, proc.stderr[-2000:]
    out = json.loads(proc.stdout.strip().splitlines()[-1])
    assert out["doc_stats"] > 0


def test_config_temperature_mix_and_knn_actions(spark, tmp_path):
    cfg = {
        "input": SF_DIR,
        "warehouse": str(tmp_path / "wh3"),
        "pipeline": [
            {"action": "documents"},
            {"action": "temperature_mix", "alpha": 0.75, "save": True},
            {"action": "embeddings"},
            {"action": "knn_label_vote", "k": 5, "save": True},
        ],
    }
    result = run_config(spark, cfg)
    from ml4logs_spark.operators import similarity, textqa

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    assert result["temperature_mix"] == textqa.temperature_mix_sample(
        docs, alpha=0.75
    ).count()
    assert result["knn_label_vote"] == similarity.knn_label_vote(emb, k=5).count()


def test_config_transcript_curation_actions(spark, tmp_path):
    """conv_quality / curate_transcripts actions dispatch and match the
    direct operator composition (chain == config-wired chain)."""
    from ml4logs_spark import cache
    from ml4logs_spark.datagen import transcripts as tx
    from ml4logs_spark.operators import curate, windows

    cfg = {
        "input": SF_DIR,
        "warehouse": str(tmp_path / "whct"),
        "pipeline": [
            {"action": "transcripts"},
            {"action": "conv_quality", "min_user_frac": 0.2, "save": True},
            {"action": "curate_transcripts", "from": "transcripts",
             "max_turns": 100, "seq_tokens": 512, "save": True},
        ],
    }
    cache.release_all()
    result = run_config(spark, cfg)
    t = tx.transcripts(spark, SF_DIR)
    assert result["conv_quality"] == windows.conv_quality_flags(
        t, min_user_frac=0.2
    ).count()
    cache.release_all()
    direct = curate.curate_transcripts(t, max_turns=100, seq_tokens=512)
    assert result["curate_transcripts"] == direct.count()
    saved = spark.read.parquet(str(tmp_path / "whct" / "curate_transcripts"))
    key = ["conv_id", "turn_idx"]
    a = saved.toPandas().sort_values(key).reset_index(drop=True)
    b = direct.toPandas().sort_values(key).reset_index(drop=True)
    assert (a.seq_id.values == b.seq_id.values).all()
    assert (a.token_offset.values == b.token_offset.values).all()
    cache.release_all()


def test_config_conv_near_dup_actions(spark, tmp_path):
    """conv_near_dups / conv_bands / conv_shingle_store /
    incremental_conv_near_dups dispatch: the config-wired day-2
    conversation near-dup (history split by the md5(conv_id) hex
    nibble, state = band table + shingle store) matches the direct
    operator composition, and the batch action matches
    dedup.conv_near_dups."""
    from ml4logs_spark.datagen import transcripts as tx
    from ml4logs_spark.operators import dedup

    hist_w = "substring(md5(conv_id), 1, 1) < '8'"
    new_w = "substring(md5(conv_id), 1, 1) >= '8'"
    cfg = {
        "input": SF_DIR,
        "warehouse": str(tmp_path / "whcnd"),
        "pipeline": [
            {"action": "transcripts"},
            {"action": "conv_near_dups", "threshold": 0.15, "save": True},
            {"action": "conv_bands", "where": hist_w, "out": "hist_bands"},
            {"action": "conv_shingle_store", "where": hist_w,
             "out": "hist_store"},
            {"action": "incremental_conv_near_dups", "where": new_w,
             "bands": "hist_bands", "store": "hist_store",
             "threshold": 0.15, "save": True},
        ],
    }
    result = run_config(spark, cfg)
    t = tx.transcripts(spark, SF_DIR)
    assert result["conv_near_dups"] == dedup.conv_near_dups(
        t, threshold=0.15
    ).count()
    nib = "substring(md5(conv_id), 1, 1)"
    hist_docs = dedup.conv_text_docs(t.filter(f"{nib} < '8'"))
    direct = dedup.incremental_conv_near_dups(
        t.filter(f"{nib} >= '8'"),
        dedup.lsh_bands(dedup.minhash_signatures(hist_docs)),
        dedup.shingle_store(hist_docs),
        threshold=0.15,
    )
    assert result["incremental_conv_near_dups"] == direct.count() > 0

"""Streaming parse->enrich->windowed aggregate equals the batch answer
once the stream drains (availableNow)."""

from pyspark.sql import functions as F

from tests.conftest import SF_DIR


def test_stream_counts_match_batch(spark, turns, tmp_path):
    from ml4logs_spark.operators import parse
    from ml4logs_spark.streaming import stream_pipeline as sp

    # stage input as multiple files to force several micro-batches
    in_dir = str(tmp_path / "stream_in")
    turns.repartition(8).write.parquet(in_dir)

    dim = parse.template_dim(turns)
    stream = sp.stream_transcripts(spark, in_dir)
    counts = sp.windowed_sink_counts(stream, dim, window="24 hours")
    q = sp.run_to_memory(counts, name="t_stream_counts")
    got = spark.table("t_stream_counts").toPandas()
    q.stop()

    # batch oracle with the same windowing
    p = parse.parsed_turns(turns, dim)
    batch = (
        p.groupBy(
            F.window("ts", "24 hours").alias("w"),
            F.pmod("template_id", F.lit(8)).alias("template_bucket"),
            "role",
        )
        .agg(F.count(F.lit(1)).alias("n_rows"))
        .select(F.col("w.start").alias("window_start"), "template_bucket", "role", "n_rows")
        .toPandas()
    )
    key = ["window_start", "template_bucket", "role"]
    a = got.sort_values(key).reset_index(drop=True)
    b = batch.sort_values(key).reset_index(drop=True)
    assert len(a) == len(b)
    assert (a.n_rows.values == b.n_rows.values).all()

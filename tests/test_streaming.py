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


def test_stream_exact_dedup_matches_batch(spark, turns, tmp_path):
    """Streaming dropDuplicates on the content hash keeps exactly one
    row per distinct text once the stream drains (all data inside one
    watermark horizon -> identical to the batch exact dedup)."""
    from ml4logs_spark.streaming import dedup as sdedup
    from ml4logs_spark.streaming import stream_pipeline as sp

    in_dir = str(tmp_path / "dedup_in")
    turns.repartition(6).write.parquet(in_dir)

    stream = sp.stream_transcripts(spark, in_dir)
    deduped = sdedup.stream_exact_dedup(stream, watermark="365 days")
    q = (
        deduped.select("text_hash")
        .writeStream.format("memory")
        .queryName("t_stream_dedup")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = spark.table("t_stream_dedup").toPandas()
    q.stop()

    from pyspark.sql import functions as F2
    n_distinct = turns.select(
        F2.md5(F2.coalesce("text", F2.lit(""))).alias("h")
    ).distinct().count()
    # exactly one survivor per distinct content, no hash appears twice
    assert len(got) == n_distinct
    assert got.text_hash.nunique() == n_distinct


def test_stream_first_seen_counts_bounded(spark, turns, tmp_path):
    from ml4logs_spark.streaming import dedup as sdedup
    from ml4logs_spark.streaming import stream_pipeline as sp

    in_dir = str(tmp_path / "dedup_counts_in")
    turns.repartition(4).write.parquet(in_dir)
    stream = sp.stream_transcripts(spark, in_dir)
    counts = sdedup.stream_first_seen_counts(
        stream, watermark="365 days", window="24 hours"
    )
    q = (
        counts.writeStream.format("memory")
        .queryName("t_first_seen")
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = spark.table("t_first_seen").toPandas()
    q.stop()
    assert len(got) > 0
    # unique-content counts can never exceed total distinct texts
    from pyspark.sql import functions as F2
    n_distinct = turns.select(
        F2.md5(F2.coalesce("text", F2.lit(""))).alias("h")
    ).distinct().count()
    assert got.n_unique.sum() <= n_distinct


def test_stream_template_match_and_encode(spark, turns, tmp_path):
    """The custom pandas operators (drain template match, embedding
    encoder) run unchanged over a streaming source — map-only UDFs are
    streaming-safe, so the mined-template assignment and the per-turn
    embeddings equal their batch results after drain."""
    from ml4logs_spark.operators import drain, encode
    from ml4logs_spark.streaming import stream_pipeline as sp

    in_dir = str(tmp_path / "match_in")
    turns.repartition(5).write.parquet(in_dir)
    tpls = drain.fit_templates(turns, sample_size=2000)

    stream = sp.stream_transcripts(spark, in_dir)
    matched = drain.match_templates(stream, tpls)
    embedded = encode.turn_embeddings(matched, dim=4).withColumnRenamed(
        "embedding", "vec"
    )
    joined = matched.select("conv_id", "turn_idx", "drain_template")
    q = (
        joined.writeStream.format("memory").queryName("t_stream_match")
        .outputMode("append").trigger(availableNow=True).start()
    )
    q.awaitTermination(120)
    got = spark.table("t_stream_match").toPandas()
    q.stop()

    batch = drain.match_templates(turns, tpls).select(
        "conv_id", "turn_idx", "drain_template"
    ).toPandas()
    key = ["conv_id", "turn_idx"]
    a = got.sort_values(key).reset_index(drop=True)
    b = batch.sort_values(key).reset_index(drop=True)
    assert len(a) == len(b)
    assert (a.drain_template.fillna("~") == b.drain_template.fillna("~")).all()

    q2 = (
        embedded.select("conv_id", "turn_idx", "vec")
        .writeStream.format("memory").queryName("t_stream_vec")
        .outputMode("append").trigger(availableNow=True).start()
    )
    q2.awaitTermination(120)
    vecs = spark.table("t_stream_vec").toPandas()
    q2.stop()
    assert len(vecs) == len(b)
    assert vecs.vec.map(len).eq(4).all()


def test_stream_route_sink_and_checkpoint_resume(spark, turns, tmp_path):
    """Fan-out streaming sink: routed-row equality with the batch parse,
    then a restart with the same checkpoint emits ONLY newly arrived
    input (exactly-once file-source/file-sink resume)."""
    from ml4logs_spark.operators import parse
    from ml4logs_spark.streaming import route_sink, stream_pipeline as sp

    in_dir = tmp_path / "route_in"
    out_dir = str(tmp_path / "route_out")
    ckpt = str(tmp_path / "route_ckpt")
    first = turns.filter(F.col("turn_idx") % 2 == 0)
    second = turns.filter(F.col("turn_idx") % 2 == 1)
    first.repartition(3).write.parquet(str(in_dir))

    dim = parse.template_dim(turns)
    q = route_sink.start_route_sink(
        sp.stream_transcripts(spark, str(in_dir)), dim, out_dir, ckpt
    )
    q.awaitTermination(120); q.stop()
    got1 = spark.read.parquet(out_dir)
    assert got1.count() == first.count()
    # routed-row equality vs the batch parse on the same slice
    batch = parse.parsed_turns(first, dim).withColumn(
        "template_bucket", F.pmod("template_id", F.lit(8))
    )
    key = ["conv_id", "turn_idx"]
    a = got1.select(*key, "template_id").toPandas().sort_values(key)
    b = batch.select(*key, "template_id").toPandas().sort_values(key)
    assert a.template_id.tolist() == b.template_id.tolist()
    # partition layout: fan-out directories by bucket exist
    import os
    assert any(d.startswith("template_bucket=") for d in os.listdir(out_dir))

    # late arrivals: add the second half, restart with SAME checkpoint
    second.repartition(2).write.mode("append").parquet(str(in_dir))
    q2 = route_sink.start_route_sink(
        sp.stream_transcripts(spark, str(in_dir)), dim, out_dir, ckpt
    )
    q2.awaitTermination(120); q2.stop()
    got2 = spark.read.parquet(out_dir)
    # only the delta was appended — no double-processing of batch one
    assert got2.count() == turns.count()


def test_stream_scrub_and_chunk_match_batch(spark, tmp_path):
    """The map-only curation steps (PII scrub, token-window chunking)
    run unchanged over a streaming source and equal their batch
    results — pure Catalyst projections/explodes are streaming-safe."""
    from ml4logs_spark.operators import textqa

    docs = spark.createDataFrame(
        [(i, f"tok{i} " * (i % 7 + 1) + f"mail{i}@example.com end", f"s{i % 2}")
         for i in range(40)],
        "doc_id long, text string, source string",
    )
    in_dir = str(tmp_path / "docs_in")
    docs.repartition(3).write.parquet(in_dir)

    stream = (
        spark.readStream.schema("doc_id long, text string, source string")
        .parquet(in_dir)
    )
    chunked = textqa.chunk_documents(
        textqa.mask_pii(stream).select(
            "doc_id", textqa.F.col("masked_text").alias("text")
        ),
        chunk_tokens=4,
        overlap=1,
    )
    q = (
        chunked.writeStream.format("memory").queryName("t_stream_chunks")
        .outputMode("append").trigger(availableNow=True).start()
    )
    q.awaitTermination(120)
    got = spark.table("t_stream_chunks").toPandas()
    q.stop()

    batch = textqa.chunk_documents(
        textqa.mask_pii(docs).select(
            "doc_id", textqa.F.col("masked_text").alias("text")
        ),
        chunk_tokens=4,
        overlap=1,
    ).toPandas()
    key = ["doc_id", "chunk_idx"]
    a = got.sort_values(key).reset_index(drop=True)
    b = batch.sort_values(key).reset_index(drop=True)
    assert len(a) == len(b) > 0
    assert (a.chunk_text == b.chunk_text).all()
    assert a.chunk_text.str.contains("<EMAIL>").any()


def test_stream_quality_gate_and_mix_sample_match_batch(spark, tmp_path):
    """The curation gate + data-mixing draw are stateless (map-only
    filter/broadcast-join), so they run unchanged over a streaming
    source and equal their batch results — a streaming ingest can apply
    the SAME mixture policy as the batch curation pass."""
    from ml4logs_spark.operators import textqa

    docs = spark.createDataFrame(
        [(i, ("the quick token " * (i % 9 + 1)).strip(), f"s{i % 3}")
         for i in range(60)],
        "doc_id long, text string, source string",
    )
    in_dir = str(tmp_path / "gate_in")
    docs.repartition(3).write.parquet(in_dir)
    weights = {"s0": "c0", "s1": "40"}  # s2 dropped

    def chain(df):
        gated = textqa.quality_filter(
            df, min_score=0.3, min_tokens=4, keep_cols=("source",)
        )
        return textqa.source_mix_sample(gated, weights).select(
            "doc_id", "source"
        )

    stream = (
        spark.readStream.schema("doc_id long, text string, source string")
        .parquet(in_dir)
    )
    q = (
        chain(stream).writeStream.format("memory")
        .queryName("t_stream_gate_mix").outputMode("append")
        .trigger(availableNow=True).start()
    )
    q.awaitTermination(120)
    got = spark.table("t_stream_gate_mix").toPandas()
    q.stop()

    batch = chain(docs).toPandas()
    a = got.sort_values("doc_id").reset_index(drop=True)
    b = batch.sort_values("doc_id").reset_index(drop=True)
    assert len(a) == len(b) > 0
    assert (a.doc_id == b.doc_id).all() and (a.source == b.source).all()
    assert set(a.source) <= {"s0", "s1"}


def test_streaming_daily_health_matches_batch(spark, turns, tmp_path):
    """Once the stream drains, the streaming health rollup's exact
    columns (turns, error/tool counts and ppm rates) equal the batch
    daily_health_rollup per day, and the HLL conv estimate is within
    its documented error of the exact count."""
    from ml4logs_spark.operators import windows
    from ml4logs_spark.streaming import stream_pipeline as sp

    in_dir = str(tmp_path / "health_in")
    turns.repartition(8).write.parquet(in_dir)

    health = sp.streaming_daily_health(sp.stream_transcripts(spark, in_dir))
    q = sp.run_to_memory(health, name="t_stream_health")
    got = spark.table("t_stream_health").toPandas().set_index("day_us")
    q.stop()

    batch = windows.daily_health_rollup(turns).toPandas().set_index("day_us")
    assert set(got.index) == set(batch.index)
    for day, b in batch.iterrows():
        g = got.loc[day]
        for c in ("n_turns", "n_error_turns", "n_tool_turns",
                  "error_ppm", "tool_ppm"):
            assert g[c] == b[c], (day, c)
        assert abs(g["approx_convs"] - b["n_convs"]) <= max(
            2, 0.1 * b["n_convs"]
        )

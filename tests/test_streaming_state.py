"""Stateful streaming sessionizer equals the batch sessionizer after the
stream drains — state must survive across micro-batches (the input is
split into many files, so a conversation's turns arrive in several
batches)."""

from tests.conftest import SF_DIR


def test_stateful_sessions_match_batch(spark, turns, tmp_path):
    from ml4logs_spark.operators import windows
    from ml4logs_spark.streaming import sessionize, stream_pipeline as sp

    in_dir = str(tmp_path / "stream_in")
    # order files by turn ranges so per-conv state genuinely spans batches
    turns.repartitionByRange(6, "turn_idx").write.parquet(in_dir)
    sp.stamp_file_order(in_dir)

    stream = sp.stream_transcripts(spark, in_dir)
    out = sessionize.stream_sessions(stream, gap_seconds=3600)
    q = (
        out.writeStream.format("memory")
        .queryName("t_sessions")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    got = spark.table("t_sessions").toPandas()
    q.stop()

    want = (
        windows.with_sessions(turns, gap_seconds=3600)
        .select("conv_id", "turn_idx", "session_idx")
        .toPandas()
    )
    key = ["conv_id", "turn_idx"]
    a = got.sort_values(key).reset_index(drop=True)
    b = want.sort_values(key).reset_index(drop=True)
    assert len(a) == len(b)

    # session ids must match exactly: maxFilesPerTrigger=4 over
    # range-partitioned files delivers turns in order, so cross-batch
    # state reconstruction must agree with the batch window
    assert (a.session_idx.values == b.session_idx.astype("int64").values).all()

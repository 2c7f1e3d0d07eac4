"""Round-6 optimization profiler: isolate each headline bench component
with noop-sink timing (guide §1.4) and substage breakdowns, without
touching the frozen bench.py. Mirrors bench.py's session + input setup
exactly (bucketed table, shuffle partitions, warm-up) so numbers are
comparable to BENCH_r05.json.

Usage: python tools/profile_r06.py [component ...]
Components: sft_inc_conv_neardup sft_inc_branch_dedup telemetry
            sft_curate small e2e
"""

from __future__ import annotations

import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import bench  # noqa: E402  (frozen; reused for ensure_input/force)


def force(df):
    df.write.format("noop").mode("overwrite").save()


def timed(label, thunk, reps=3):
    import statistics

    runs = []
    for _ in range(reps):
        t0 = time.perf_counter()
        thunk()
        runs.append(time.perf_counter() - t0)
    med = statistics.median(runs)
    print(f"  {label:42s} {med:7.3f}s  (runs: {', '.join(f'{r:.3f}' for r in runs)})",
          flush=True)
    return med


def main():
    os.chdir(REPO)
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cores = os.environ.get("SPARK_GRAFT_CPUS", "32")
    ncores = int(cores) if str(cores).isdigit() else 32
    n_parts = max(16, 2 * ncores)

    from ml4logs_spark.session import get_spark

    spark = get_spark(
        app_name="profile_r06", cores=cores, shuffle_partitions=n_parts,
        extra_conf={
            "spark.sql.catalogImplementation": "hive",
            "spark.sql.warehouse.dir": os.path.join(REPO, ".data", "warehouse"),
        },
    )
    tbl = bench.ensure_input(spark, sf_dir, 1, 64)
    turns = spark.table(tbl)
    n_turns = turns.count()
    print(f"table {tbl}: {n_turns} turns, n_parts={n_parts}", flush=True)

    from pyspark.sql import functions as F

    from ml4logs_spark.operators import dedup as dedup_op
    from ml4logs_spark.operators import windows

    which = set(sys.argv[1:]) or {
        "sft_inc_conv_neardup", "sft_inc_branch_dedup", "telemetry",
        "sft_curate", "small",
    }

    if "sft_inc_conv_neardup" in which:
        print("== sft_inc_conv_neardup ==", flush=True)
        _nib = F.substring(F.md5("conv_id"), 1, 1)
        _hist_docs = dedup_op.conv_text_docs(turns.filter(_nib < F.lit("8")))
        _cbands = dedup_op.lsh_bands(
            dedup_op.minhash_signatures(_hist_docs)).persist()
        _cstore = dedup_op.shingle_store(_hist_docs).persist()
        _cbands.count(); _cstore.count()
        _new_turns = turns.filter(_nib >= F.lit("8"))

        new_docs = dedup_op.conv_text_docs(_new_turns).persist()
        timed("conv_text_docs(new)", lambda: force(new_docs))
        sigs = dedup_op.minhash_signatures(new_docs)
        timed("minhash_signatures(new_docs)", lambda: force(sigs))
        nb = dedup_op.lsh_bands(sigs).persist()
        timed("lsh_bands (materialize)", lambda: nb.count())
        new_store = dedup_op.shingle_store(new_docs).persist()
        timed("shingle_store(new_docs)", lambda: new_store.count())
        cands = dedup_op.incremental_near_dups(new_docs, _cbands).persist()
        timed("candidates (inc_near_dups)", lambda: cands.count())
        store = _cstore.select("doc_id", "sh_sig").unionByName(
            new_store.join(_cstore.select("doc_id"), "doc_id", "left_anti"))
        verified = dedup_op.store_jaccard_pairs(store, cands).filter(
            F.col("jaccard") >= 0.15)
        timed("verify (store_jaccard_pairs)", lambda: verified.count())
        timed("FULL incremental_conv_near_dups", lambda: dedup_op.incremental_conv_near_dups(
            _new_turns, _cbands, _cstore, threshold=0.15).count())
        for df in (_cbands, _cstore, new_docs, nb, new_store, cands):
            df.unpersist()

    if "sft_inc_branch_dedup" in which:
        print("== sft_inc_branch_dedup ==", flush=True)
        from pyspark.sql.window import Window as _W

        _nib = F.substring(F.md5("conv_id"), 1, 1)
        _bw = _W.partitionBy("conv_id").orderBy("turn_idx")
        _bbase = turns.select(
            "conv_id", "turn_idx", "role", "text", "tool", "ts",
            (F.row_number().over(_bw) - 1).alias("_pos"),
            F.count(F.lit(1)).over(_W.partitionBy("conv_id")).alias("_n"),
        )
        _bcut = (
            _bbase.filter(F.substring(F.md5("conv_id"), 1, 1) == F.lit("0"))
            .filter(F.col("_pos") < F.floor((F.col("_n") + 1) / 2))
            .select(
                F.concat(F.col("conv_id"), F.lit("-cut")).alias("conv_id"),
                "turn_idx", "role", "text", "tool", "ts",
            )
        )
        _baug = turns.unionByName(_bcut)
        _pstate = dedup_op.conv_prefix_state(
            _baug.filter(_nib < F.lit("8"))).persist()
        _pframes = dedup_op.conv_frame_store(
            _baug.filter(_nib < F.lit("8"))).persist()
        _pstate.count(); _pframes.count()
        _bnew = _baug.filter(_nib >= F.lit("8"))

        new_state = dedup_op.conv_prefix_state(_bnew).persist()
        timed("conv_prefix_state(new)", lambda: new_state.count())
        new_frames = dedup_op.conv_frame_store(_bnew).persist()
        timed("conv_frame_store(new)", lambda: new_frames.count())
        timed("FULL incremental_conv_prefix_dups", lambda: dedup_op.incremental_conv_prefix_dups(
            _bnew, _pstate, _pframes).count())
        for df in (_pstate, _pframes, new_state, new_frames):
            df.unpersist()

    if "telemetry" in which:
        print("== telemetry_pack ==", flush=True)
        for f in (
            windows.tool_latency_percentiles,
            windows.tool_latency_histogram_state,
            windows.daily_health_rollup,
            windows.daily_health_drift,
            windows.slowest_tool_calls,
            windows.time_to_first_tool,
            windows.tool_transition_counts,
            windows.tool_retry_runs,
            windows.tool_error_attribution,
            windows.conv_endings,
            windows.conv_ending_rollup,
        ):
            timed(f.__name__, lambda f=f: force(f(turns)))

    if "sft_curate" in which:
        print("== sft_curate ==", flush=True)
        from ml4logs_spark import cache as _tcache
        from ml4logs_spark.operators import curate as _tcurate

        def run():
            _tcache.release_all()
            _tcurate.curate_transcripts(turns).count()
            _tcache.release_all()

        timed("curate_transcripts (full)", run)

    if "small" in which:
        print("== small queries ==", flush=True)
        from ml4logs_spark.datagen import transcripts as tx
        from ml4logs_spark.operators import enrich as enrich_op
        from ml4logs_spark.operators import features as feat
        from ml4logs_spark.operators import parse, route

        role_d, tool_d = tx.role_dim(spark), tx.tool_dim(spark)
        dim = parse.template_dim(turns).cache()
        dim.count()
        timed("parse_assign", lambda: force(
            parse.parsed_turns(turns, dim).select(
                "conv_id", "turn_idx", "template_id")))
        timed("enrich", lambda: force(
            enrich_op.enrich(parse.parsed_turns(turns, dim), role_d, tool_d)))
        timed("sink_counts", lambda: force(
            route.sink_counts(parse.parsed_turns(turns, dim))))
        timed("conv_tool_counts", lambda: force(
            feat.conv_tool_counts(parse.parsed_turns(turns, dim))))
        timed("timedeltas", lambda: force(
            windows.with_timedeltas(turns).select("conv_id", "turn_idx", "td")))

    spark.stop()


if __name__ == "__main__":
    main()

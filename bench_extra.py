"""Cold one-shot component timings replicating bench.py's methodology
(state built untimed, ONE timed action — the frozen bench times each of
these regions exactly once per run), without touching the frozen
bench.py. Run ONE component per process so first-execution costs
(Catalyst planning + codegen compile) are charged the same way the
driver's bench charges them.

Usage: python bench_extra.py <component> [reps]
Components: sft_curate sft_inc_conv_neardup sft_inc_branch_dedup
            telemetry inc_neardup_docs inc_simhash_docs nb_classify
            perplexity bpe_fit knn semdedup pq curate_docs
Output: one JSON line {"component": ..., "secs": [..], "extra": {...}}
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
REPO = os.path.dirname(os.path.abspath(__file__))


def main() -> None:
    os.chdir(REPO)
    which = sys.argv[1]
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 1
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cores = os.environ.get("SPARK_GRAFT_CPUS", "32")
    ncores = int(cores) if str(cores).isdigit() else 32
    n_parts = max(16, 2 * ncores)

    import bench
    from pyspark.sql import functions as F

    from ml4logs_spark.session import get_spark

    spark = get_spark(
        app_name=f"bench_extra_{which}", cores=cores,
        shuffle_partitions=n_parts,
        extra_conf={
            "spark.sql.catalogImplementation": "hive",
            "spark.sql.warehouse.dir": os.path.join(REPO, ".data", "warehouse"),
        },
    )
    spark.sparkContext.setJobDescription(f"bench_extra:{which}")
    tbl = bench.ensure_input(spark, sf_dir, 1, 64)
    turns = spark.table(tbl)
    n_turns = turns.count()

    from ml4logs_spark import cache
    from ml4logs_spark.operators import dedup as dedup_op

    secs: list[float] = []
    extra: dict = {}

    def timed(thunk):
        for _ in range(reps):
            cache.release_all()
            t0 = time.perf_counter()
            thunk()
            secs.append(round(time.perf_counter() - t0, 3))

    if which == "sft_curate":
        from ml4logs_spark.operators import curate as _tcurate

        def run():
            _tcurate.curate_transcripts(turns).count()

        timed(run)

    elif which == "sft_inc_conv_neardup":
        _nib = F.substring(F.md5("conv_id"), 1, 1)
        _hist_docs = dedup_op.conv_text_docs(turns.filter(_nib < F.lit("8")))
        _cbands = dedup_op.lsh_bands(
            dedup_op.minhash_signatures(_hist_docs)).persist()
        _cstore = dedup_op.shingle_store(_hist_docs).persist()
        _cbands.count(); _cstore.count()
        _new_turns = turns.filter(_nib >= F.lit("8"))
        timed(lambda: dedup_op.incremental_conv_near_dups(
            _new_turns, _cbands, _cstore, threshold=0.15).count())

    elif which == "sft_inc_branch_dedup":
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
        timed(lambda: dedup_op.incremental_conv_prefix_dups(
            _bnew, _pstate, _pframes).count())

    elif which == "telemetry":
        from ml4logs_spark.operators import windows

        def force(df):
            df.write.format("noop").mode("overwrite").save()

        def run():
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
                force(f(turns))

        timed(run)

    elif which in ("inc_neardup_docs", "inc_simhash_docs", "nb_classify",
                   "perplexity", "bpe_fit", "knn", "semdedup", "pq",
                   "curate_docs"):
        docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
        n_raw = docs.count()
        sh_rep = max(1, 100_000 // max(n_raw, 1))
        sh_corpus = (
            docs.crossJoin(spark.range(sh_rep).withColumnRenamed("id", "rep"))
            .select(
                (F.col("doc_id") + F.col("rep") * F.lit(n_raw)).alias("doc_id"),
                F.concat_ws(
                    " ", "text", F.concat(F.lit("r"), F.col("rep"))
                ).alias("text"),
            )
            .repartition(n_parts)
            .persist()
        )
        sh_corpus.count()
        if which == "inc_neardup_docs":
            hist = sh_corpus.filter(F.col("doc_id") % 2 == 0)
            new_batch = sh_corpus.filter(F.col("doc_id") % 2 == 1)
            seen_bands = dedup_op.lsh_bands(
                dedup_op.minhash_signatures(hist)).persist()
            seen_store = dedup_op.shingle_store(hist).persist()
            seen_bands.count(); seen_store.count()
            timed(lambda: extra.update(pairs=dedup_op.incremental_near_dup_verified(
                new_batch, seen_bands, seen_store).count()))
        elif which == "inc_simhash_docs":
            hist = sh_corpus.filter(F.col("doc_id") % 2 == 0)
            new_batch = sh_corpus.filter(F.col("doc_id") % 2 == 1)
            hist_sigs = dedup_op.simhash64(hist).persist()
            hist_sigs.count()
            timed(lambda: extra.update(pairs=dedup_op.incremental_simhash_near_dups(
                new_batch, hist_sigs).count()))
        elif which in ("nb_classify", "perplexity", "bpe_fit"):
            from ml4logs_spark.operators import classify as classify_op
            from ml4logs_spark.operators import textqa as textqa_op
            from ml4logs_spark.operators import bpe as bpe_op

            nb_corpus = (
                docs.crossJoin(
                    spark.range(sh_rep).withColumnRenamed("id", "rep"))
                .select(
                    (F.col("doc_id") + F.col("rep") * F.lit(n_raw)).alias(
                        "doc_id"),
                    F.concat_ws(
                        " ", "text", F.concat(F.lit("r"), F.col("rep"))
                    ).alias("text"),
                    "source",
                )
                .repartition(n_parts)
                .persist()
            )
            nb_corpus.count()

            def force(df):
                df.write.format("noop").mode("overwrite").save()

            if which == "nb_classify":
                timed(lambda: force(
                    classify_op.nb_source_classify_split(nb_corpus)))
            elif which == "perplexity":
                timed(lambda: force(textqa_op.perplexity_buckets(nb_corpus)))
            else:
                timed(lambda: bpe_op.bpe_fit(nb_corpus, n_merges=16).count())
        elif which == "curate_docs":
            from ml4logs_spark.operators import curate

            rep = int(os.environ.get("SPARK_GRAFT_CURATE_REPLICATE", "200"))
            n_base = docs.count()
            corpus = (
                docs.crossJoin(
                    spark.range(rep).withColumnRenamed("id", "rep"))
                .select(
                    (F.col("doc_id") + F.col("rep") * F.lit(n_base)).alias(
                        "doc_id"),
                    F.concat_ws(
                        " ", "text", F.concat(F.lit("r"), F.col("rep"))
                    ).alias("text"),
                )
                .repartition(n_parts)
            )
            bench_docs = spark.range(1000).select(
                (F.col("id") + 10_000_000).alias("doc_id"),
                F.concat_ws(
                    " ", F.lit("heldout"), F.col("id").cast("string"),
                    F.lit("evaluation suite probe item"),
                    F.concat(F.lit("v"), (F.col("id") % 97).cast("string")),
                ).alias("text"),
            )
            timed(lambda: extra.update(
                chunks=curate.curate_corpus(corpus, bench_docs).count()))
        else:
            from ml4logs_spark.operators import similarity

            emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
            qids = list(range(5))
            if which == "knn":
                clustered_lab = bench._clustered_fixture(spark).withColumn(
                    "label", (F.col("vec_id") % 8).cast("int")
                )
                timed(lambda: extra.update(
                    acc_iso=similarity.knn_label_accuracy(emb, k=5),
                    acc_clu=similarity.knn_label_accuracy(clustered_lab, k=5),
                ))
            elif which == "semdedup":
                timed(lambda: extra.update(
                    kept=similarity.semantic_dedup_survivors(
                        emb, threshold=0.4, n_centroids=64).count()))
            elif which == "pq":
                pq_clustered = bench._clustered_fixture(spark)
                pq_kw = dict(m=4, dim=16, ksub=16, n_iters=2, sample_mod=1)

                def run():
                    tk = similarity.pq_topk(
                        pq_clustered, query_ids=qids, k=10, **pq_kw
                    ).toPandas()
                    extra["purity"] = float(
                        ((tk.query_id % 8) == (tk.cand_id % 8)).mean())
                    extra["recall"] = similarity.pq_recall(
                        pq_clustered, qids, k=10, **pq_kw)

                timed(run)
    else:
        raise SystemExit(f"unknown component {which!r}")

    cache.release_all()
    spark.stop()
    print(json.dumps({
        "component": which, "secs": secs, "turns": n_turns, "extra": extra,
    }))


if __name__ == "__main__":
    main()

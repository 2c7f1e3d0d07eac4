"""Benchmark harness: end-to-end pipeline throughput at $SPARK_GRAFT_SF_DIR.

Prints ONE JSON line:
  {"metric": "...", "value": <total sec>, "unit": "sec",
   "queries": {...per-query sec...}, "sf": <sf>, "turns": N,
   "turns_per_sec": T, "cores": C}

Protocol
--------
- The transcripts fact table is materialized ONCE (outside timing) to
  repo-local parquet — the pipeline's real input is a table scan, not
  the derivation (at cluster scale it is an Iceberg table; the
  derivation exists only because the sandbox testdata has no transcripts
  table).
- Each query is forced with a noop-format write: full computation, zero
  rows serialized to Python (.count() would let Catalyst prune work).
- $SPARK_GRAFT_REPLICATE=k scales the input k-fold (per-conv structure
  preserved) for the two-parallelism scaling-efficiency evidence
  (tools/bench_scaling.py; BENCH/BASELINE.md).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

REPO = os.path.dirname(os.path.abspath(__file__))


def force(df) -> None:
    df.write.format("noop").mode("overwrite").save()


def _stream_bench(spark, turns) -> dict:
    """Streaming fan-out sink evidence: rows/sec through the
    checkpointed route sink, and the exactly-once restart contract
    measured directly — input arrives in two phases with a full
    stop/restart between them, and the overlap count (output rows minus
    input rows) must be 0: nothing double-processed, nothing lost."""
    import shutil

    from pyspark.sql import functions as F

    from ml4logs_spark.operators import parse
    from ml4logs_spark.streaming import route_sink, stream_pipeline as sp

    base = os.path.join(REPO, ".data", "stream_bench")
    shutil.rmtree(base, ignore_errors=True)
    in_dir = os.path.join(base, "in")
    out_dir = os.path.join(base, "out")
    ckpt = os.path.join(base, "ckpt")

    dim = parse.template_dim(turns).cache()
    dim.count()
    in_rows = turns.count()
    half = F.substring(F.md5("conv_id"), 1, 1) <= "7"
    turns.filter(half).repartition(8).write.parquet(in_dir)

    t0 = time.perf_counter()
    q = route_sink.start_route_sink(
        sp.stream_transcripts(spark, in_dir), dim, out_dir, ckpt)
    q.awaitTermination()
    # phase 2: new files land, the sink restarts from its checkpoint
    turns.filter(~half).repartition(8).write.mode("append").parquet(in_dir)
    q = route_sink.start_route_sink(
        sp.stream_transcripts(spark, in_dir), dim, out_dir, ckpt)
    q.awaitTermination()
    wall = round(time.perf_counter() - t0, 3)

    out_rows = spark.read.parquet(out_dir).count()
    result = {
        "stream_rows": in_rows,
        "stream_wall_sec": wall,
        "stream_rows_per_sec": round(in_rows / wall, 1),
        # wall covers TWO full checkpointed query lifecycles (cold start
        # + restart-from-checkpoint) — the exactly-once proof, not a
        # steady-state throughput number
        "stream_note": "includes cold start + checkpoint restart",
        "restart_overlap_rows": out_rows - in_rows,
        "exactly_once_pass": out_rows == in_rows,
    }

    # live latency path: stateful per-conv pairing + histogram ledger.
    # Input is range-split by turn_idx (a conversation's turns arrive
    # in order but across micro-batches — the Kafka-partitioned-by-
    # conv_id delivery model), so the one-row-per-conv pairing state is
    # genuinely exercised; the ledger's timed-call total must equal the
    # batch histogram's (stream-equals-batch, checked every bench run).
    from ml4logs_spark.operators import windows as _w
    from ml4logs_spark.streaming import latency

    lat_in = os.path.join(base, "lat_in")
    turns.repartitionByRange(8, "turn_idx").write.parquet(lat_in)
    sp.stamp_file_order(lat_in)
    t0 = time.perf_counter()
    q = latency.run_latency_ingest(
        sp.stream_transcripts(spark, lat_in),
        state_dir=os.path.join(base, "lat_state"),
        checkpoint_dir=os.path.join(base, "lat_ckpt"),
    )
    q.awaitTermination()
    lat_wall = round(time.perf_counter() - t0, 3)
    ledger = {
        (r.tool, r.bucket_lo): r.n
        for r in latency.read_latency_state(
            spark, os.path.join(base, "lat_state")
        ).collect()
    }
    batch_hist = {
        (r.tool, r.bucket_lo): r.n
        for r in _w.tool_latency_histogram_state(turns).collect()
    }
    result.update({
        "latency_stream_wall_sec": lat_wall,
        "latency_stream_rows_per_sec": round(in_rows / lat_wall, 1),
        "latency_ledger_timed_calls": sum(ledger.values()),
        "latency_ledger_matches_batch": ledger == batch_hist,
    })
    shutil.rmtree(base, ignore_errors=True)
    return result


def _clustered_fixture(spark, n=500, dim=16, n_clusters=8, seed=23):
    """Deterministic angularly-clustered embeddings (cluster centers +
    gaussian noise) — the geometry real embedding corpora have, used to
    grade LSH pruning at high recall."""
    import numpy as np

    rng = np.random.default_rng(seed)
    centers = rng.normal(size=(n_clusters, dim))
    centers /= np.linalg.norm(centers, axis=1, keepdims=True)
    rows = []
    for i in range(n):
        v = centers[i % n_clusters] + 0.1 * rng.normal(size=dim)
        rows.append((i, [float(x) for x in v.astype("float32")]))
    return spark.createDataFrame(rows, "vec_id long, embedding array<float>")


# md5-prefix threshold for the skew fixture: convs below it merge into
# the giant conversation. "a6"/256 ~ 65% of rows -> at sf0.1 the whale
# is ~65k turns vs a ~66-turn median = the x1000 Zipf tail under test.
SKEW_PREFIX = "a6"


def ensure_input(
    spark, sf_dir: str, replicate: int, buckets: int = 64, skew: bool = False
) -> str:
    """Materialize (once) the bench input as a bucketed+sorted table.

    bucketBy(conv_id) + sortBy(conv_id, turn_idx) is the local analog of
    an Iceberg partition/sort-order spec: every conv-keyed window and
    aggregation downstream runs shuffle-free (tools/explain_audit.py
    verifies 0 exchanges), which is what makes the pipeline scale — the
    shuffle was the worst-scaling component. Returns the table name.
    ``buckets`` (env SPARK_GRAFT_BUCKETS) sets task granularity: more
    buckets = finer tasks = smaller stage tails at high parallelism.

    ``skew=True`` builds the Zipf-tail variant: conversations whose
    md5 prefix sorts below SKEW_PREFIX (~65% of rows) merge into ONE
    giant conversation ~1000x the median size, turn indices renumbered
    disjointly (48-bit conv-hash block + original index, map-side).
    The giant conv lands in a single bucket — exactly the straggler
    shape a power-law corpus hands a conv-partitioned table.
    """
    from pyspark.sql import functions as F

    from ml4logs_spark.datagen import transcripts as tx

    tag = sf_dir.rstrip("/").rsplit("/", 1)[-1] + (f"_x{replicate}" if replicate > 1 else "")
    if buckets != 64:
        tag += f"_b{buckets}"
    if skew:
        tag += f"_skew{SKEW_PREFIX}"
    tbl = f"bench_{tag}".replace(".", "_")
    if not spark.catalog.tableExists(tbl):
        t = tx.replicate(tx.transcripts(spark, sf_dir), replicate)
        if skew:
            giant = F.substring(F.md5("conv_id"), 1, 2) < SKEW_PREFIX
            block = F.conv(F.substring(F.md5("conv_id"), 1, 12), 16, 10).cast(
                "long"
            )
            t = t.select(
                F.when(giant, F.lit("conv-zipf-giant"))
                .otherwise(F.col("conv_id"))
                .alias("conv_id"),
                F.when(giant, block * F.lit(4096) + F.col("turn_idx"))
                .otherwise(F.col("turn_idx").cast("long"))
                .alias("turn_idx"),
                *[c for c in t.columns if c not in ("conv_id", "turn_idx")],
            )
        (
            t.repartition(buckets, "conv_id")  # one file per bucket
            .write.bucketBy(buckets, "conv_id")
            .sortBy("conv_id", "turn_idx")
            .mode("overwrite")
            .saveAsTable(tbl)
        )
    return tbl


def main() -> None:
    os.chdir(REPO)  # derby metastore_db resolves relative to cwd
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cores = os.environ.get("SPARK_GRAFT_CPUS", "32")
    replicate = int(os.environ.get("SPARK_GRAFT_REPLICATE", "1"))
    sf = float(sf_dir.rstrip("/").rsplit("sf", 1)[-1]) if "sf" in sf_dir else -1.0

    from ml4logs_spark.session import get_spark
    from ml4logs_spark.datagen import transcripts as tx
    from ml4logs_spark.operators import enrich as enrich_op
    from ml4logs_spark.operators import features as feat
    from ml4logs_spark.operators import parse, route, windows

    cores = str(cores)
    if cores.isdigit():
        ncores = int(cores)
    elif cores.startswith("local-cluster["):
        n_exec, c_exec = (int(x) for x in cores.split("[")[1].split("]")[0].split(",")[:2])
        ncores = n_exec * c_exec
    else:
        ncores = 32
    n_parts = max(16, 2 * ncores)
    lc_conf = (
        {"spark.executor.memory": os.environ.get("ML4S_EXECUTOR_MEM", "5g")}
        if cores.startswith("local-cluster[") else {}
    )
    java_opts = os.environ.get("ML4S_EXECUTOR_JAVA_OPTS")
    if java_opts:
        lc_conf["spark.executor.extraJavaOptions"] = java_opts
    spark = get_spark(app_name="ml4logs_bench", cores=cores,
                      shuffle_partitions=n_parts,
                      extra_conf={**lc_conf,
                          # persistent catalog so the bucketed input table
                          # survives across bench processes (single-writer
                          # derby; bench runs are sequential)
                          "spark.sql.catalogImplementation": "hive",
                          "spark.sql.warehouse.dir": os.path.join(REPO, ".data", "warehouse"),
                      })

    buckets = int(os.environ.get("SPARK_GRAFT_BUCKETS", "64"))
    tbl = ensure_input(spark, sf_dir, replicate, buckets)
    turns = spark.table(tbl)
    n_turns = turns.count()  # warms JVM + page cache outside timing

    timings: dict[str, float] = {}

    def timed(name, thunk):
        t0 = time.perf_counter()
        thunk()
        timings[name] = round(time.perf_counter() - t0, 3)

    role_d, tool_d = tx.role_dim(spark), tx.tool_dim(spark)

    # End-to-end: template fit + parse -> enrich -> route counts +
    # feature aggregates + window features, one pass over the table per
    # branch (the metric BASELINE.json targets).
    from concurrent.futures import ThreadPoolExecutor

    from pyspark.sql import functions as F

    def e2e(t=None):
        t = turns if t is None else t
        dim = parse.template_dim(t)
        p = parse.parsed_turns(t, dim)
        e = enrich_op.enrich(p, role_d, tool_d)
        # Shared pre-aggregation: ONE pass over the fact table produces
        # the finest-grained count cube (conv, role, tool, template);
        # per-sink counts and the TF-IDF input are tiny re-aggregations
        # of it. At 100 TB this replaces two full scans with one — the
        # standard shared-preagg plan for multi-output pipelines. The
        # groupBy keys are conv-prefixed, so the bucketed input makes
        # this shuffle-free.
        pre = (
            e.withColumn("template_bucket", F.pmod("template_id", F.lit(8)))
            .groupBy("conv_id", "role", "tool", "template_bucket", "template_id")
            .agg(F.count(F.lit(1)).alias("cnt"))
            .cache()
        )

        def branch_sinks():
            force(pre.groupBy("template_bucket", "role").agg(
                F.sum("cnt").alias("n_rows"),
                F.countDistinct("conv_id").alias("n_convs"),
            ))

        def branch_tfidf():
            counts = pre.groupBy("conv_id", "tool", "template_id").agg(
                F.sum("cnt").alias("cnt")
            )
            force(feat.apply_tfidf(counts, feat.fit_idf(counts)))

        def branch_td():
            force(windows.with_timedeltas(t).select("conv_id", "turn_idx", "td"))

        # independent output branches submit concurrently (Spark's FIFO
        # scheduler interleaves their stages) so driver-side job
        # boundaries don't serialize the cluster — same practice as
        # multi-sink production jobs. (Measured: overlapping branch_td
        # with the pre materialization, or FAIR pools, both LOWER
        # throughput here — two concurrent full scans contend for the
        # same host memory bus; FIFO + post-cache branch concurrency is
        # the best measured schedule.)
        t_pre0 = time.perf_counter()
        pre.count()  # materialize the shared pre-agg cache
        t_pre = time.perf_counter() - t_pre0
        try:
            with ThreadPoolExecutor(3) as ex:
                futures = [ex.submit(b) for b in (branch_sinks, branch_tfidf, branch_td)]
                for f in futures:
                    f.result()
        finally:
            pre.unpersist()
        if os.environ.get("SPARK_GRAFT_DEBUG_PHASES") == "1":
            print(f"PHASE pre={t_pre:.2f} branches={time.perf_counter() - t_pre0 - t_pre:.2f}",
                  flush=True)

    e2e()  # warm-up: JIT + broadcast paths; steady-state is what scales
    # median-of-3 by default: single-shot e2e timings carry host noise
    # (round-1 measured 2.7s one-shot vs 1.9s median on the same build)
    reps = int(os.environ.get("SPARK_GRAFT_BENCH_REPS", "3"))

    def measure_e2e(t=None):
        """Median-of-reps wall for one e2e() input (warm-up already done
        for the uniform table; callers warm other inputs themselves)."""
        import statistics
        runs = []
        for _ in range(max(reps, 1)):
            t0 = time.perf_counter()
            e2e(t)
            runs.append(time.perf_counter() - t0)
        return round(statistics.median(runs), 3)

    if os.environ.get("SPARK_GRAFT_E2E_ONLY") == "1":
        timings["e2e_pipeline"] = measure_e2e()
        total = round(sum(timings.values()), 3)
        out = {
            "metric": "parse_enrich_route_aggregate_wall",
            "value": total, "unit": "sec", "queries": timings, "sf": sf,
            "turns": n_turns,
            "turns_per_sec": round(n_turns / timings["e2e_pipeline"], 1),
            "cores": cores,
        }
        spark.stop()
        print(json.dumps(out))
        return

    # -------- skew evidence: Zipf-tail giant conversation -----------
    # Same pipeline, same row count, but ~20% of turns merged into ONE
    # conversation (~1000x the median) occupying a single bucket — the
    # straggler shape route.py's salting and the O(1)-state windows are
    # designed for. The claim under measurement (VERDICT r3 #7/r4 #4):
    # the skewed wall stays within ~1.3x of the uniform wall.
    #
    # Tables build and warm HERE, but the headline e2e/skew TIMING runs
    # at the END of the bench: both measured anomalies (r5 datapoints:
    # e2e 11-14s in full-bench runs whose later sections were normal,
    # vs 1.3-2.3s for the identical code in e2e-only mode minutes
    # later) happened in the first ~minute of a bench process — disk
    # writeback from the table build plus host-load decay — while the
    # late-timed components (parse_assign, sink_counts) stayed at their
    # steady-state values in the SAME runs. Timing last measures the
    # steady state the 100x projection is based on.
    skew_out: dict = {}
    sk = spark.table(ensure_input(spark, sf_dir, replicate, buckets, skew=True))
    sizes = (
        sk.groupBy("conv_id").count()
        .agg(
            F.max("count").alias("mx"),
            F.expr("percentile_approx(count, 0.5)").alias("md"),
        )
        .first()
    )
    e2e(sk)  # warm: JIT + broadcast for the skewed shapes

    def measure_skew():
        timings["skew_e2e"] = measure_e2e(sk)
        skew_out.update({
            "skew_e2e_sec": timings["skew_e2e"],
            "uniform_e2e_sec": timings["e2e_pipeline"],
            "skew_over_uniform": round(
                timings["skew_e2e"] / timings["e2e_pipeline"], 3
            ),
            "giant_conv_turns": int(sizes.mx),
            "median_conv_turns": int(sizes.md),
            "skew_factor": round(sizes.mx / max(sizes.md, 1), 1),
        })

    # -------- documents/embeddings path: simhash cost + ANN recall ----
    # (outside the headline turns/sec metric; recorded so the ANN scale
    # path is GRADED on recall, not just smoke-run)
    docs_out: dict = {}
    emb_path = f"{sf_dir}/embeddings.parquet"
    docs_path = f"{sf_dir}/documents.parquet"
    if os.path.exists(emb_path) and os.path.exists(docs_path):
        from ml4logs_spark import cache
        from ml4logs_spark.operators import dedup as dedup_op
        from ml4logs_spark.operators import similarity
        from ml4logs_spark.operators import textqa as textqa_op

        docs = spark.read.parquet(docs_path)
        # measure signature throughput on a >=100k-doc replicated corpus
        # (rep suffix keeps texts distinct); at raw fixture size the wall
        # is fixed overhead, not per-doc work
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
        )
        # the raw fixture parquet is a single split, so the replicated
        # frame would inherit ~1 partition and use one core — spread it
        sh_corpus = sh_corpus.repartition(n_parts).persist()
        n_docs = sh_corpus.count()  # materialize before the clock starts
        t0 = time.perf_counter()
        force(dedup_op.simhash64(sh_corpus))
        _sh = time.perf_counter() - t0
        # span-level dedup (block-hash ExactSubstr approximation) on the
        # same replicated corpus: explode -> min-agg on block hash ->
        # reassemble, end-to-end
        t0 = time.perf_counter()
        force(dedup_op.span_dedup(sh_corpus))
        _sp = time.perf_counter() - t0
        # boilerplate-span removal on the same corpus (every block of
        # the replicated base text is corpus-frequent here, so the
        # filter is under maximal load: nearly all blocks drop)
        t0 = time.perf_counter()
        force(dedup_op.boilerplate_span_filter(sh_corpus))
        _bp = time.perf_counter() - t0
        # stream packing: chunk the corpus and cut the global chunk
        # stream into 512-token sequences via the two-phase distributed
        # prefix sum (chunk explode included in the timed wall)
        t0 = time.perf_counter()
        packed = textqa_op.pack_sequences(
            textqa_op.chunk_documents(sh_corpus, chunk_tokens=64, overlap=8),
            seq_tokens=512,
        )
        n_chunks = packed.count()
        _pk = time.perf_counter() - t0
        cache.release_all()
        # day-2 incremental ingest: half the corpus plays history,
        # present ONLY as persisted state (LSH bands + shingle store +
        # simhash signatures — built outside timing: that is day-1's
        # work); the other half arrives as the new batch. Timed: the
        # verified near-dup pass and the simhash hamming<=3 pass, both
        # of which never rescan historical text.
        hist = sh_corpus.filter(F.col("doc_id") % 2 == 0)
        new_batch = sh_corpus.filter(F.col("doc_id") % 2 == 1)
        seen_bands = dedup_op.lsh_bands(
            dedup_op.minhash_signatures(hist)).persist()
        seen_store = dedup_op.shingle_store(hist).persist()
        hist_sigs = dedup_op.simhash64(hist).persist()
        n_new = new_batch.count()
        seen_bands.count(); seen_store.count(); hist_sigs.count()
        t0 = time.perf_counter()
        inc_pairs = dedup_op.incremental_near_dup_verified(
            new_batch, seen_bands, seen_store).count()
        _inc = time.perf_counter() - t0
        t0 = time.perf_counter()
        incsh_pairs = dedup_op.incremental_simhash_near_dups(
            new_batch, hist_sigs).count()
        _incsh = time.perf_counter() - t0
        for _df in (seen_bands, seen_store, hist_sigs):
            _df.unpersist()
        sh_corpus.unpersist()
        # in-plan quality models on the same >=100k replicated corpus
        # (rebuilt with the source column): NB fit-on-half/classify-half
        # and the CCNet perplexity tiering (unigram LM + distributed
        # two-phase per-source ranking), each end-to-end
        from ml4logs_spark.operators import classify as classify_op

        nb_corpus = (
            docs.crossJoin(spark.range(sh_rep).withColumnRenamed("id", "rep"))
            .select(
                (F.col("doc_id") + F.col("rep") * F.lit(n_raw)).alias(
                    "doc_id"
                ),
                F.concat_ws(
                    " ", "text", F.concat(F.lit("r"), F.col("rep"))
                ).alias("text"),
                "source",
            )
            .repartition(n_parts)
            .persist()
        )
        n_nb = nb_corpus.count()
        t0 = time.perf_counter()
        force(classify_op.nb_source_classify_split(nb_corpus))
        _nb = time.perf_counter() - t0
        t0 = time.perf_counter()
        force(textqa_op.perplexity_buckets(nb_corpus))
        _ppx = time.perf_counter() - t0
        # BPE merge learning: 16 rounds of pair-count argmax over the
        # word-TYPE dim (the corpus is scanned once) — the tokenizer-fit
        # wall a pipeline pays per vocab sweep
        from ml4logs_spark.operators import bpe as bpe_op

        t0 = time.perf_counter()
        n_bpe = bpe_op.bpe_fit(nb_corpus, n_merges=16).count()
        _bpe = time.perf_counter() - t0
        cache.release_all()
        nb_corpus.unpersist()
        docs_out["simhash_docs"] = n_docs
        docs_out["simhash_sec"] = round(_sh, 3)
        docs_out["simhash_docs_per_sec"] = round(n_docs / _sh, 1)
        docs_out["span_dedup_sec"] = round(_sp, 3)
        docs_out["span_dedup_docs_per_sec"] = round(n_docs / _sp, 1)
        docs_out["boilerplate_filter_sec"] = round(_bp, 3)
        docs_out["boilerplate_filter_docs_per_sec"] = round(n_docs / _bp, 1)
        docs_out["pack_sequences_sec"] = round(_pk, 3)
        docs_out["pack_sequences_chunks"] = n_chunks
        docs_out["pack_sequences_chunks_per_sec"] = round(n_chunks / _pk, 1)
        docs_out["incremental_batch_docs"] = n_new
        docs_out["incremental_neardup_sec"] = round(_inc, 3)
        docs_out["incremental_neardup_docs_per_sec"] = round(n_new / _inc, 1)
        # the replicated fixture makes EVERY doc a true near-dup of its
        # rep-siblings, so pair volume (not per-doc cost) dominates the
        # wall — pairs/sec is the load-invariant number
        docs_out["incremental_neardup_pairs"] = inc_pairs
        docs_out["incremental_neardup_pairs_per_sec"] = round(inc_pairs / _inc, 1)
        docs_out["incremental_simhash_sec"] = round(_incsh, 3)
        docs_out["incremental_simhash_docs_per_sec"] = round(n_new / _incsh, 1)
        docs_out["nb_classify_docs"] = n_nb
        docs_out["nb_classify_sec"] = round(_nb, 3)
        docs_out["nb_classify_docs_per_sec"] = round(n_nb / _nb, 1)
        docs_out["perplexity_buckets_sec"] = round(_ppx, 3)
        docs_out["perplexity_buckets_docs_per_sec"] = round(n_nb / _ppx, 1)
        docs_out["bpe_fit_merges"] = n_bpe
        docs_out["bpe_fit_sec"] = round(_bpe, 3)
        docs_out["bpe_fit_merges_per_sec"] = round(n_bpe / _bpe, 2)
        docs_out["incremental_simhash_pairs"] = incsh_pairs
        docs_out["incremental_simhash_pairs_per_sec"] = round(
            incsh_pairs / _incsh, 1)
        emb = spark.read.parquet(emb_path)
        qids = list(range(5))
        t0 = time.perf_counter()
        recall = similarity.ann_recall(emb, qids, k=10)
        frac = similarity.lsh_candidate_fraction(emb, qids)
        docs_out.update({
            "ann_recall_at_10": recall,
            "ann_recall_floor": 0.7,
            "ann_recall_pass": recall >= 0.7,
            # the pruning number: fraction of the corpus exactly
            # re-ranked per query (lower = real bucketing win; the
            # isotropic fixture is the theory-forced worst case)
            "ann_candidate_fraction": frac,
            "ann_config": "8 planes x 4 bands (isotropic-gaussian worst case)",
            "ann_sec": round(time.perf_counter() - t0, 3),
        })
        t0 = time.perf_counter()
        cb = similarity.fit_ivf_codebook(emb).cache()
        docs_out.update({
            "ivf_recall_at_10": similarity.ivf_recall(emb, qids, k=10, codebook=cb),
            "ivf_candidate_fraction": similarity.ivf_candidate_fraction(
                emb, qids, codebook=cb),
            "ivf_config": "trained 16-centroid Lloyd codebook, 4 probes",
            # isotropic gaussians have no cluster structure, so IVF
            # recall is information-bounded near the candidate fraction;
            # the clustered rows below show the codebook's intended
            # operating regime
            "ivf_note": "isotropic floor: recall tracks candidate fraction",
            "ivf_sec": round(time.perf_counter() - t0, 3),
        })
        # int8 scalar quantization: the representation-accuracy probe
        # for the 4x-smaller ANN state path — brute-force top-k over
        # the dequantized corpus vs the float32 exact baseline
        t0 = time.perf_counter()
        q_recall = similarity.quantized_recall(emb, qids, k=10)
        docs_out.update({
            "quantized_recall_at_10": q_recall,
            "quantized_recall_floor": 0.9,
            "quantized_recall_pass": q_recall >= 0.9,
            "quantized_config": "int8 affine per-dim (min/max fit), 4x smaller state",
            "quantized_sec": round(time.perf_counter() - t0, 3),
        })
        # product quantization: the 64x-smaller state path (m codes per
        # vector). Coarse codes collapse within-cluster rank order, so
        # the probe is neighborhood membership on the clustered fixture
        # (fraction of PQ top-10 neighbours in the query's true
        # cluster) plus the rank-level recall for the record.
        t0 = time.perf_counter()
        pq_clustered = _clustered_fixture(spark)
        pq_kw = dict(m=4, dim=16, ksub=16, n_iters=2, sample_mod=1)
        pq_tk = similarity.pq_topk(
            pq_clustered, query_ids=qids, k=10, **pq_kw
        ).toPandas()
        pq_purity = float(
            ((pq_tk.query_id % 8) == (pq_tk.cand_id % 8)).mean()
        )
        docs_out.update({
            "pq_cluster_purity_at_10": round(pq_purity, 4),
            "pq_purity_floor": 0.9,
            "pq_purity_pass": pq_purity >= 0.9,
            "pq_recall_at_10": similarity.pq_recall(
                pq_clustered, qids, k=10, **pq_kw
            ),
            "pq_config": "m=4 subspaces x 16 centroids, 64x smaller state",
            "pq_sec": round(time.perf_counter() - t0, 3),
        })
        # kNN label-vote classifier (embedding-space quality/domain
        # tagging): accuracy of the broadcast-seed majority vote
        # against the corpus's true labels — the held-out fraction is
        # everything outside the md5 seed draw
        t0 = time.perf_counter()
        clustered_lab = _clustered_fixture(spark).withColumn(
            "label", (F.col("vec_id") % 8).cast("int")
        )
        docs_out.update({
            # the parquet labels are uniform-random over isotropic
            # vectors — 10 classes, so ~0.10 is the chance floor (the
            # operator has nothing to learn from); the clustered row
            # below is the classifier's intended operating regime
            "knn_label_acc_isotropic": similarity.knn_label_accuracy(emb, k=5),
            "knn_label_acc_clustered": similarity.knn_label_accuracy(
                clustered_lab, k=5
            ),
            "knn_config": "k=5, seed draw 2000/0x10000 (12.5%)",
            "knn_note": "isotropic = 10-class chance floor ~0.10",
            "knn_sec": round(time.perf_counter() - t0, 3),
        })
        # day-2 embedding ingest: even vec_ids play history, present
        # ONLY as persisted state (band table + int8 codes + frozen
        # quantizer — built outside timing: that is day-1's work); odd
        # ids arrive as the new batch. Timed: the cross-boundary +
        # within-batch near-dup pass over state alone.
        # 16 planes x 4 bands (4-bit sigs) is the dedup-probing scale
        # config: exact/near-identical dups collide in every band
        # regardless of plane count, so extra planes only prune FALSE
        # candidates — measured 2.2x faster than the 8x4 search
        # default on the isotropic fixture at identical exact-dup
        # recall (the dropped pairs are weak 0.4-cosine isotropic
        # "nears", not duplicates).
        ehist = emb.filter(F.col("vec_id") % 2 == 0)
        enew = emb.filter(F.col("vec_id") % 2 == 1)
        equant = similarity.fit_quantizer(ehist).persist()
        ebands = similarity.band_signatures(
            ehist, n_planes=16, n_bands=4, dim=64).persist()
        ecodes = similarity.quantize_embeddings(ehist, equant).persist()
        equant.count(); ebands.count(); ecodes.count()
        n_enew = enew.count()
        t0 = time.perf_counter()
        inc_emb_pairs = similarity.incremental_embedding_near_dups(
            enew, ebands, ecodes, equant, n_planes=16, n_bands=4).count()
        _ince = time.perf_counter() - t0
        for _df in (equant, ebands, ecodes):
            _df.unpersist()
        docs_out.update({
            "incremental_embedding_batch_vecs": n_enew,
            "incremental_embedding_config": "16 planes x 4 bands, int8 state",
            "incremental_embedding_sec": round(_ince, 3),
            "incremental_embedding_vecs_per_sec": round(n_enew / _ince, 1),
            "incremental_embedding_pairs": inc_emb_pairs,
        })
        # SemDeDup: within-cell greedy semantic dedup over the trained
        # codebook (0.4 stands in for the ~0.95 production threshold
        # on the isotropic fixture). 64 cells is the scale config —
        # candidate volume is sum(cell^2), so finer cells cut pairwise
        # work: measured 1.56x faster than 16 cells at sf0.1 with
        # near-identical survivors (1834 vs 1799 of 5000; cross-cell
        # near-pairs are the documented granularity/recall tradeoff).
        n_vecs = emb.count()
        t0 = time.perf_counter()
        sem_kept = similarity.semantic_dedup_survivors(
            emb, threshold=0.4, n_centroids=64
        ).count()
        _sem = time.perf_counter() - t0
        docs_out.update({
            "semdedup_vecs": n_vecs,
            "semdedup_survivors": sem_kept,
            "semdedup_config": "64-cell trained codebook, threshold 0.4",
            "semdedup_sec": round(_sem, 3),
            "semdedup_vecs_per_sec": round(n_vecs / _sem, 1),
        })
        # clustered fixture (realistic embedding geometry): the bands
        # must show genuine pruning at high recall — isotropic gaussians
        # above are the no-structure floor where pruning is theory-
        # limited (similarity.lsh_topk docstring table).
        t0 = time.perf_counter()
        clustered = _clustered_fixture(spark)
        c_recall = similarity.ann_recall(
            clustered, qids, k=10, n_planes=24, n_bands=4, dim=16)
        c_frac = similarity.lsh_candidate_fraction(
            clustered, qids, n_planes=24, n_bands=4, dim=16)
        docs_out.update({
            "ann_clustered_recall_at_10": c_recall,
            "ann_clustered_candidate_fraction": c_frac,
            "ann_clustered_config": "24 planes x 4 bands, 8 clusters x 16 dims",
            "ann_clustered_sec": round(time.perf_counter() - t0, 3),
        })
        # trained IVF on the same clustered corpus — k-means cells line
        # up with the true clusters, so probing few cells should hold
        # recall at a much lower candidate fraction than the isotropic
        # case above (the codebook's intended operating regime).
        t0 = time.perf_counter()
        ccb = similarity.fit_ivf_codebook(clustered, 8).cache()
        docs_out.update({
            "ivf_clustered_recall_at_10": similarity.ivf_recall(
                clustered, qids, k=10, n_centroids=8, n_probes=2, codebook=ccb),
            "ivf_clustered_candidate_fraction": similarity.ivf_candidate_fraction(
                clustered, qids, n_centroids=8, n_probes=2, codebook=ccb),
            "ivf_clustered_config": "8 trained centroids, 2 probes, 8 clusters x 16 dims",
            "ivf_clustered_sec": round(time.perf_counter() - t0, 3),
        })
        # full curation chain throughput: replicate the docs table (rep
        # suffix keeps texts distinct so dedup doesn't trivially
        # collapse) and run dedup -> gate -> decontaminate -> scrub ->
        # chunk end-to-end. The held-out benchmark is synthetic with a
        # DISJOINT vocabulary: the fixture corpus draws on ~31 words, so
        # any real slice as benchmark shingle-contaminates ~everything
        # and the chunk stage would run on 0 rows. The drop-path
        # SEMANTICS are proven by the oracle-checked decontaminated /
        # curated_chunks queries; this measures wall-clock with every
        # stage doing real work.
        from ml4logs_spark.operators import curate

        rep = int(os.environ.get("SPARK_GRAFT_CURATE_REPLICATE", "200"))
        n_base = docs.count()
        corpus = (
            docs.crossJoin(spark.range(rep).withColumnRenamed("id", "rep"))
            .select(
                (F.col("doc_id") + F.col("rep") * F.lit(n_base)).alias("doc_id"),
                F.concat_ws(" ", "text", F.concat(F.lit("r"), F.col("rep")))
                .alias("text"),
            )
            # single-split parquet x broadcast range = 1 input partition;
            # spread so the first map stage (hashing) uses every core
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
        t0 = time.perf_counter()
        n_chunks = curate.curate_corpus(corpus, bench_docs).count()
        wall = time.perf_counter() - t0
        # free the tracked diamond-node persists (curate's gated frame)
        # and the bench-local codebook caches before the next section
        from ml4logs_spark import cache as _cache

        _cache.release_all()
        cb.unpersist()
        ccb.unpersist()
        docs_out.update({
            "curate_docs_in": n_base * rep,
            "curate_chunks_out": n_chunks,
            "curate_sec": round(wall, 3),
            "curate_docs_per_sec": round(n_base * rep / wall, 1),
        })

    # -------- streaming route sink: throughput + exactly-once restart
    stream_out = _stream_bench(spark, turns)

    dim = parse.template_dim(turns).cache()
    dim.count()
    timed("parse_assign", lambda: force(
        parse.parsed_turns(turns, dim).select("conv_id", "turn_idx", "template_id")))
    timed("enrich", lambda: force(
        enrich_op.enrich(parse.parsed_turns(turns, dim), role_d, tool_d)))
    timed("sink_counts", lambda: force(
        route.sink_counts(parse.parsed_turns(turns, dim))))
    timed("conv_tool_counts", lambda: force(
        feat.conv_tool_counts(parse.parsed_turns(turns, dim))))
    timed("timedeltas", lambda: force(
        windows.with_timedeltas(turns).select("conv_id", "turn_idx", "td")))

    # the full agent-telemetry pack in one measured component: exact
    # percentiles, histogram state + publish, health rollup + drift,
    # triage (top-k, funnel, handoffs, retry storms), attribution and
    # ending rollup — all pure Catalyst aggregates/windows over the
    # bucketed turns table; the wall evidences that the whole ops
    # dashboard costs a few e2e-equivalents, not a new pipeline
    def _telemetry_pack():
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

    timed("telemetry_pack", _telemetry_pack)

    # transcript curation chain (SFT prep): conv dedup -> stutter strip
    # -> quality gate -> stream packing over the full turns table in
    # one measured action (tracked diamond persists freed after)
    from ml4logs_spark import cache as _tcache
    from ml4logs_spark.operators import curate as _tcurate

    _tcache.release_all()
    t0 = time.perf_counter()
    n_sft_rows = _tcurate.curate_transcripts(turns).count()
    sft_wall = time.perf_counter() - t0
    _tcache.release_all()
    timings["sft_curate"] = round(sft_wall, 3)
    # day-2 conversation near-dup: history convs (md5 nibble 0-7)
    # present ONLY as persisted band + shingle-store state (day-1's
    # work, built outside timing); timed = the new batch's adapter
    # aggregation + verified near-dup pass against that state
    _nib = F.substring(F.md5("conv_id"), 1, 1)
    _hist_docs = dedup_op.conv_text_docs(turns.filter(_nib < F.lit("8")))
    _cbands = dedup_op.lsh_bands(
        dedup_op.minhash_signatures(_hist_docs)).persist()
    _cstore = dedup_op.shingle_store(_hist_docs).persist()
    _cbands.count(); _cstore.count()
    _new_turns = turns.filter(_nib >= F.lit("8"))
    n_new_convs = _new_turns.select("conv_id").distinct().count()
    t0 = time.perf_counter()
    conv_nd_pairs = dedup_op.incremental_conv_near_dups(
        _new_turns, _cbands, _cstore, threshold=0.15
    ).count()
    conv_nd_wall = time.perf_counter() - t0
    _cbands.unpersist(); _cstore.unpersist()
    timings["sft_inc_conv_neardup"] = round(conv_nd_wall, 3)
    # day-2 branch dedup: history present ONLY as the two fixed-width
    # state tables (per-depth prefix sums + per-turn frame hashes,
    # day-1's work); timed = the new batch's window pass + candidate
    # join + exact verification against them. The input is the branch
    # fixture (nibble-'0' convs re-ingested as half-length '-cut'
    # stubs, built outside timing) so the timed pass verifies real
    # positives, not just empty candidate joins.
    from pyspark.sql.window import Window as _W

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
    n_bnew_convs = _bnew.select("conv_id").distinct().count()
    t0 = time.perf_counter()
    branch_pairs = dedup_op.incremental_conv_prefix_dups(
        _bnew, _pstate, _pframes
    ).count()
    branch_wall = time.perf_counter() - t0
    _pstate.unpersist(); _pframes.unpersist()
    from ml4logs_spark import cache as _bcache
    _bcache.release_all()
    timings["sft_inc_branch_dedup"] = round(branch_wall, 3)
    sft_out = {
        "sft_turns_in": n_turns,
        "sft_rows_out": n_sft_rows,
        "sft_curate_turns_per_sec": round(n_turns / sft_wall, 1),
        "inc_conv_neardup_new_convs": n_new_convs,
        "inc_conv_neardup_pairs": conv_nd_pairs,
        "inc_conv_neardup_convs_per_sec": round(n_new_convs / conv_nd_wall, 1),
        "inc_branch_dedup_new_convs": n_bnew_convs,
        "inc_branch_dedup_pairs": branch_pairs,
        "inc_branch_dedup_convs_per_sec": round(n_bnew_convs / branch_wall, 1),
    }

    # headline e2e + skew timing, deferred to steady state (see the
    # skew-section comment): the plans are long warm — uniform warmed
    # before the docs sections, skewed right after its table build —
    # so this measures per-row cost, not process ramp-up.
    load1 = round(os.getloadavg()[0], 2)  # host state at timing, for the record
    timings["e2e_pipeline"] = measure_e2e()
    measure_skew()

    total = round(sum(timings.values()), 3)
    out = {
        "metric": "parse_enrich_route_aggregate_wall",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "sf": sf,
        "turns": n_turns,
        "turns_per_sec": round(n_turns / timings["e2e_pipeline"], 1),
        "cores": cores,
        "load1_at_e2e": load1,
        "skew": skew_out,
        "sft": sft_out,
        "docs": docs_out,
        "streaming": stream_out,
    }
    spark.stop()
    print(json.dumps(out))


if __name__ == "__main__":
    main()

"""Two-parallelism scaling-efficiency evidence (sandbox protocol).

BASELINE.json's criterion — throughput scaling efficiency >= 0.8 from N
to 4N executors — cannot use a real cluster here; per the driver
protocol it is evidenced by running the SAME job at local[8] and
local[32] on the SAME input and reporting throughput at both plus
efficiency = (thr_32 / thr_8) / 4.

Each run is a fresh subprocess (fresh JVM). The input is the sf0.1
transcripts table replicated $SPARK_GRAFT_REPLICATE-fold (default 32 ->
~3.2M turns) so per-core work dominates fixed overhead, mirroring the
100 TB regime where tasks are long relative to scheduling.

Writes BENCH/BASELINE.md and BENCH/scaling.json.

Usage: python tools/bench_scaling.py [replicate]
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent


def run_bench(cores, replicate: int, sf_dir: str) -> dict:
    env = dict(
        os.environ,
        SPARK_GRAFT_CPUS=str(cores),
        SPARK_GRAFT_REPLICATE=str(replicate),
        SPARK_GRAFT_SF_DIR=sf_dir,
        SPARK_GRAFT_BENCH_REPS=os.environ.get("SPARK_GRAFT_BENCH_REPS", "3"),
        ML4S_DRIVER_MEM="16g",
    )
    out = subprocess.run(
        [sys.executable, str(REPO / "bench.py")],
        env=env, capture_output=True, text=True, check=True,
    )
    line = [l for l in out.stdout.strip().splitlines() if l.startswith("{")][-1]
    return json.loads(line)


def main() -> None:
    replicate = int(sys.argv[1]) if len(sys.argv) > 1 else 128
    spec = os.environ.get("SPARK_GRAFT_SCALE_CORES",
                          "local-cluster[1,4,6144];local-cluster[4,4,6144]")
    sep = ";" if ";" in spec else ","
    n_lo, n_hi = spec.split(sep)
    n_lo = int(n_lo) if n_lo.isdigit() else n_lo
    n_hi = int(n_hi) if n_hi.isdigit() else n_hi
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

    # two alternating rounds per leg; keep each leg's best (min wall) —
    # host noise is one-sided (interference only adds time), so min is
    # the least-biased scalability estimate
    rounds = int(os.environ.get("SPARK_GRAFT_SCALE_ROUNDS", "2"))
    lo_runs, hi_runs = [], []
    for _ in range(rounds):
        lo_runs.append(run_bench(n_lo, replicate, sf_dir))
        hi_runs.append(run_bench(n_hi, replicate, sf_dir))
    r8 = max(lo_runs, key=lambda r: r["turns_per_sec"])
    r32 = max(hi_runs, key=lambda r: r["turns_per_sec"])
    thr8, thr32 = r8["turns_per_sec"], r32["turns_per_sec"]
    eff = round(thr32 / thr8 / 4.0, 3)

    result = {
        "protocol": f"same job, same input, {n_lo} vs {n_hi} (N vs 4N executor emulation; local-cluster = separate executor JVMs)",
        "input_turns": r8["turns"],
        "replicate": replicate,
        "lo": r8,
        "hi": r32,
        "throughput_lo": thr8,
        "throughput_hi": thr32,
        "scaling_efficiency": eff,
        "target": 0.8,
        "pass": eff >= 0.8,
    }
    bench_dir = REPO / "BENCH"
    bench_dir.mkdir(exist_ok=True)
    (bench_dir / "scaling.json").write_text(json.dumps(result, indent=2))

    md = f"""# BENCH/BASELINE.md — scaling-efficiency evidence

Per BASELINE.json the target is end-to-end parse->enrich->route->aggregate
throughput with scaling efficiency >= 0.8 from N to 4N executors. The
sandbox protocol (no real cluster): the same job on the same input at
`{n_lo}` vs `{n_hi}`, efficiency = (thr_hi / thr_lo) / 4. local-cluster[n,c,mem]
spawns n real executor JVMs with c cores each — the faithful emulation of
n executors (separate heaps, real inter-JVM shuffle), unlike plain local[k].

| config | input turns | e2e wall (s) | turns/sec |
|---|---|---|---|
| `{n_lo}`  | {r8['turns']:,} | {r8['queries']['e2e_pipeline']} | {thr8:,.1f} |
| `{n_hi}` | {r32['turns']:,} | {r32['queries']['e2e_pipeline']} | {thr32:,.1f} |

**Scaling efficiency ({n_lo} -> {n_hi}): {eff}** (target >= 0.8: {"PASS" if eff >= 0.8 else "FAIL"})

Input: driver testdata sf0.1 transcripts derivation replicated x{replicate}
({r8['turns']:,} turns), materialized to parquet before timing. Fresh JVM
per configuration; e2e chain = template-dim fit + parse + broadcast enrich
+ per-sink counts + TF-IDF fit/apply + window timedeltas, each branch
forced via noop write (no driver collect).

Cluster launch analog (real deployment):

```
spark-submit --py-files dist/ml4logs_spark.zip \\
  --num-executors N --executor-cores 4 --executor-memory 8g \\
  jobs/run_pipeline.py --input <iceberg table> --out <warehouse>
```
"""
    (bench_dir / "BASELINE.md").write_text(md)
    print(json.dumps(result["lo"]["queries"]))
    print(json.dumps(result["hi"]["queries"]))
    print(f"efficiency={eff} pass={eff >= 0.8}")


if __name__ == "__main__":
    main()

"""Regenerate BENCH/BASELINE.md from the measured scaling artifacts.

All numbers come from the JSON artifacts — BENCH/scaling.json (strong),
BENCH/weak_scaling.json (weak), BENCH/datapoints.json (every recorded
strong-scaling datapoint incl. superseded methodologies) and the
bench-run docs section if present. No hand-written measurement claims:
regeneration can never drift from (or drop) committed evidence.
"""

from __future__ import annotations

import json
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
BENCH = REPO / "BENCH"


def main() -> None:
    strong = json.loads((BENCH / "scaling.json").read_text())
    weak_p = BENCH / "weak_scaling.json"
    weak = json.loads(weak_p.read_text()) if weak_p.exists() else None
    dp_p = BENCH / "datapoints.json"
    datapoints = json.loads(dp_p.read_text()) if dp_p.exists() else []

    cpu_p = BENCH / "cpu_microbench.json"
    cpu = json.loads(cpu_p.read_text()) if cpu_p.exists() else None

    lo = strong.get("lo") or strong.get("local8")
    hi = strong.get("hi") or strong.get("local32")
    eff = strong["scaling_efficiency"]
    eff_pass = eff >= strong.get("target", 0.8)
    rng = strong.get("scaling_efficiency_range")
    estimator = strong.get("estimator", "best run per leg (round-1 method)")
    stage_keys = ["parse_assign", "enrich", "sink_counts", "conv_tool_counts", "timedeltas"]
    if all(k in lo["queries"] and k in hi["queries"] for k in stage_keys):
        per_stage = "Per-stage strong scaling (median-representative runs): " + ", ".join(
            f"{k} {lo['queries'][k]}s -> {hi['queries'][k]}s" for k in stage_keys
        ) + "."
    else:
        per_stage = "(e2e-only run: per-stage timings omitted.)"

    verdict_line = (
        f"**Strong-scaling efficiency: {eff}** (target 0.8: "
        f"{'PASS' if eff_pass else 'NOT MET'})"
    )
    if rng:
        verdict_line += f" — round-to-round range [{rng[0]}, {rng[1]}]"

    md = f"""# BENCH/BASELINE.md — scaling-efficiency evidence

BASELINE.json criterion: end-to-end parse->enrich->route->aggregate
throughput with scaling efficiency >= 0.8 from N to 4N executors, on a
real cluster via `spark-submit --py-files` (jobs/run_pipeline.py). No
real cluster exists in this sandbox; per the driver protocol the same
job runs at two parallelism levels on the same input. We emulate
executors faithfully with `local-cluster[n, c, mem]` — n REAL executor
JVMs (separate heaps, inter-JVM shuffle), not threads in one JVM.

## Strong scaling (same input, N vs 4N executors)

| config | input turns | e2e wall (s) | turns/sec |
|---|---|---|---|
| `{lo['cores']}` | {lo['turns']:,} | {lo['queries']['e2e_pipeline']} | {lo['turns_per_sec']:,.1f} |
| `{hi['cores']}` | {hi['turns']:,} | {hi['queries']['e2e_pipeline']} | {hi['turns_per_sec']:,.1f} |

{verdict_line}

Estimator: {estimator}.

{per_stage}
"""
    if weak:
        wlo, whi = weak["lo"], weak["hi"]
        weff = weak["weak_scaling_efficiency"]
        md += f"""
## Weak scaling (4x data on 4x executors — the 100 TB growth model)

| config | input turns | e2e wall (s) |
|---|---|---|
| `{wlo['cores']}` | {wlo['turns']:,} | {wlo['queries']['e2e_pipeline']} |
| `{whi['cores']}` | {whi['turns']:,} | {whi['queries']['e2e_pipeline']} |

**Weak-scaling efficiency: {weff}** (1.0 = perfect: 4x the data finishes
in the same wall time on 4x the executors). Weak scaling is supporting
context for the 100 TB growth model; the stated criterion is the strong
number above.
"""
        if weak.get("weak_scaling_rounds"):
            md += (
                f"Rounds: {weak['weak_scaling_rounds']}; estimator: "
                f"{weak.get('estimator', 'single run')}.\n"
            )
    sus_p = BENCH / "sustained.json"
    sus = json.loads(sus_p.read_text()) if sus_p.exists() else None
    if sus:
        md += """
## Sustained throughput (fixed 32 cores, growing input)

| input turns | e2e wall (s) | turns/sec |
|---|---|---|
"""
        for r in sus["runs"]:
            md += (
                f"| {r['turns']:,} | {r['e2e_sec']} "
                f"| {r['turns_per_sec']:,.1f} |\n"
            )
        md += f"""
Throughput RISES with input size — the sf0.1 wall is dominated by fixed
per-query overhead (planning, codegen, task launch), so the per-row
cost the 100 TB projection depends on is far below the headline bench
number. Protocol: {sus['protocol']}.
"""

    head_p = BENCH / "headline.json"
    headline = json.loads(head_p.read_text()) if head_p.exists() else []
    if headline:
        md += """
## Headline reruns (quiet-host protocol)

sf0.1 / local[32] e2e reruns under the documented protocol (1-min load
checked before launch; median-of-reps). The per-round driver number
(BENCH_r{N}.json) is the record; these pin the same-code quiet-host
value so a loaded-host driver run is attributable to noise, not a plan
change.

| when | load at launch | e2e wall (s) | turns/sec |
|---|---|---|---|
"""
        for h in headline:
            md += (
                f"| {h.get('when', '?')} | {h.get('load1', '?')} "
                f"| {h['e2e_sec']} | {h['turns_per_sec']:,.1f} |\n"
            )

    if datapoints:
        md += """
## All recorded strong-scaling datapoints

| protocol | turns | buckets | java opts | estimator | efficiency |
|---|---|---|---|---|---|
"""
        for d in datapoints:
            md += (
                f"| {d['protocol']} | {d['input_turns']:,} | {d.get('buckets', 64)} "
                f"| {d.get('java_opts', '') or '—'} | {d.get('estimator', '?')} "
                f"| {d['efficiency']} |\n"
            )

    cpu_md = ""
    if cpu:
        ceff = cpu["efficiency"]
        cpu_md = (
            "- Executor sizing is evidence-based (BENCH/cpu_microbench.json: "
            "identical busy loop per proc, eff = T(1)/T(P)): this host scales "
            + ", ".join(f"{p} procs = {e}" for p, e in ceff.items() if p != "1")
            + ". Legs are sized so the 4N side stays inside the host's "
            "near-linear regime; the 4-core-executor variant (16 active "
            "cores on the 4N leg) is capped by the HOST at "
            f"~{ceff.get('16', '?')} and is recorded in the datapoints "
            "table, not hidden.\n"
        )
        # hi-leg active cores from local-cluster[n,c,mem]
        try:
            n_ex, c_ex = (int(x) for x in
                          hi["cores"].split("[")[1].split("]")[0].split(",")[:2])
            host_ceiling = ceff.get(str(n_ex * c_ex))
            if host_ceiling:
                share = round(eff / host_ceiling, 3)
                cpu_md += (
                    f"- At the 4N leg's {n_ex * c_ex} active cores the host "
                    f"itself sustains {host_ceiling}; the measured {eff} is "
                    f"{share} of that ceiling — the engine adds almost no "
                    "scaling loss of its own.\n"
                )
        except (IndexError, ValueError):
            pass

    md += f"""
## Reading the numbers

- Strong-scaling status: measured {eff} vs the 0.8 criterion —
  {"criterion met" if eff_pass else "criterion NOT met as written"}.
{cpu_md}
- All conv-keyed stages run shuffle-free against the bucketed+sorted
  input table (Iceberg sort-order analog; see tools/explain_audit.py:
  0 exchanges), so there is no shuffle wall at any scale.
- Input: driver testdata sf0.1 transcripts derivation replicated
  x{strong.get('replicate', '?')} ({lo['turns']:,} turns), materialized as a
  bucketed table ({strong.get('buckets', 64)} buckets) before timing; each
  branch forced via noop write (no driver collect); fresh JVM per
  configuration.

Cluster launch (real deployment):

```
spark-submit --py-files dist/ml4logs_spark.zip \\
  --num-executors N --executor-cores 4 --executor-memory 8g \\
  jobs/run_pipeline.py --input <iceberg table> --warehouse <dir>
```
"""
    (BENCH / "BASELINE.md").write_text(md)
    print("written", BENCH / "BASELINE.md")


if __name__ == "__main__":
    main()

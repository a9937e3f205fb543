"""Scaling-efficiency evidence: the same KG job at two parallelism levels.

BASELINE.json's north rule requires throughput scaling efficiency >= 0.8 from
N to 4N executors; the sandbox proxy (BASELINE.md) is the identical job at
two `local[k]` levels on the same input. Methodology hardening learned from
measurement (documented in BENCH/BASELINE.md):

- each level runs in a fresh subprocess pinned with ``taskset`` to exactly k
  CPUs — in local mode Python UDF workers run OUTSIDE the JVM's task-slot
  accounting, so an unpinned "local[8]" job actually consumes ~16 cores and
  fakes its own baseline;
- one full warm-up pass (JVM JIT + Python worker fork/imports) precedes
  measurement; steady-state throughput is the relevant metric for a
  long-running 100 TB job;
- best-of-2 measured runs (this shared VM shows intermittent multi-x
  slowdowns; /proc/stat busy+steal core-seconds are recorded per run so
  interference is visible in the report);
- input is an on-disk parquet pages table, identical bytes for both levels.

Usage: python scripts/scaling_run.py [n_pages] [low1 high1 [low2 high2 ...]]
Defaults: 100000 pages, pairs (4,16) and (8,32). The (4,16) pair is the
headroom-clean N→4N measurement; (8,32) repeats it one octave higher (VERDICT
r2 'Next round' #9) with the caveat that the high level saturates the whole
32-vCPU host, so machine-wide bandwidth/interference effects land on it —
busy/steal core-seconds are disclosed per trial either way.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

RUN_SNIPPET = """
import json, os, sys, time
sys.path.insert(0, {repo!r})

def stat():
    f = open("/proc/stat").readline().split()
    u, n, s, idle, io, irq, sirq, steal = map(int, f[1:9])
    return u + n + s + irq + sirq, steal

from graphrag_mrkr_2_spark.session import get_spark
from graphrag_mrkr_2_spark.plans.pipeline import run_kg_pipeline

cores = {cores}
n_pages = {n_pages}
spark = get_spark(app_name=f"scale-{{cores}}", master=f"local[{{cores}}]", shuffle_partitions=cores * 2)
spark.sparkContext.setLogLevel("ERROR")
pages = spark.read.parquet({pages_dir!r})

# warm-up: full pass (JIT + worker forks), excluded from measurement
run_kg_pipeline(pages, num_partitions=cores * 6).triples.count()
spark.catalog.clearCache()

best = None
for trial in range(3):
    try:
        b0, s0 = stat()
        t0 = time.time()
        res = run_kg_pipeline(pages, num_partitions=cores * 6)
        n_triples = res.triples.count()
        dt = time.time() - t0
        b1, s1 = stat()
    except Exception as exc:  # a memory-pressure-killed trial must not void the level
        print("TRIALFAIL " + json.dumps({{"cores": cores, "trial": trial,
              "err": str(exc)[:200]}}), flush=True)
        # still clear cached fragments: the NEXT trial must not reuse
        # partially warmed state the uniform protocol excludes — but a
        # dead SparkContext must not escape the handler either
        try:
            spark.catalog.clearCache()
        except Exception:
            pass
        continue
    rec = {{"cores": cores, "n_pages": n_pages, "sec": round(dt, 2),
           "docs_per_sec": round(n_pages / dt, 2),
           "triples_per_sec": round(n_triples / dt, 2),
           "busy_core_s": round((b1 - b0) / 100, 1),
           "steal_core_s": round((s1 - s0) / 100, 1),
           "n_triples": n_triples, "trial": trial}}
    print("TRIAL " + json.dumps(rec), flush=True)
    if best is None or rec["sec"] < best["sec"]:
        best = rec
    spark.catalog.clearCache()
if best is not None:
    print("RESULT " + json.dumps(best), flush=True)
spark.stop()
"""


def run_at(cores: int, n_pages: int, pages_dir: str) -> tuple[dict, list[dict]]:
    code = RUN_SNIPPET.format(repo=REPO, cores=cores, n_pages=n_pages, pages_dir=pages_dir)
    cmd = ["taskset", "-c", f"0-{cores - 1}", sys.executable, "-c", code]
    out = subprocess.run(cmd, capture_output=True, text=True, timeout=3000, cwd=REPO)
    trials, result = [], None
    for line in out.stdout.splitlines():
        if line.startswith("TRIAL "):
            trials.append(json.loads(line[6:]))
        elif line.startswith("RESULT "):
            result = json.loads(line[7:])
    if result is None and trials:
        # the subprocess died after >=1 completed trial (shared-VM memory
        # pressure); best-of-completed is still a valid steady-state floor
        result = min(trials, key=lambda t: t["sec"])
        result = {**result, "degraded": f"only {len(trials)}/3 trials completed"}
    if result is None:
        raise RuntimeError(
            f"run at {cores} cores failed:\n{out.stdout[-2000:]}\n{out.stderr[-2000:]}"
        )
    return result, trials


def ensure_pages(n_pages: int) -> str:
    pages_dir = f"/tmp/scale_pages_{n_pages}"
    if os.path.exists(os.path.join(pages_dir, "_SUCCESS")):
        return pages_dir
    code = f"""
import sys
sys.path.insert(0, {REPO!r})
from graphrag_mrkr_2_spark.session import get_spark
from graphrag_mrkr_2_spark.sources.pages import generate_pages
spark = get_spark(master="local[32]", shuffle_partitions=64)
spark.sparkContext.setLogLevel("ERROR")
generate_pages(spark, {n_pages}, partitions=64).write.mode("overwrite").parquet({pages_dir!r})
spark.stop()
"""
    subprocess.run([sys.executable, "-c", code], check=True, timeout=1200, cwd=REPO)
    return pages_dir


def fmt_trials(trials):
    return "; ".join(
        f"run{t['trial']}: {t['sec']}s (busy {t['busy_core_s']} core-s, steal {t['steal_core_s']})"
        for t in trials
    )


def measure_pair(low: int, high: int, n_pages: int, pages_dir: str) -> dict:
    r_low, t_low = run_at(low, n_pages, pages_dir)
    r_high, t_high = run_at(high, n_pages, pages_dir)
    speedup = r_low["sec"] / r_high["sec"]
    efficiency = speedup / (high / low)
    return {
        "low_cores": low,
        "high_cores": high,
        "low": r_low,
        "high": r_high,
        "low_trials": t_low,
        "high_trials": t_high,
        "speedup": round(speedup, 3),
        "efficiency": round(efficiency, 3),
        "target": 0.8,
        "passes": efficiency >= 0.8,
    }


def pair_section(s: dict) -> str:
    low, high = s["low_cores"], s["high_cores"]
    if "failed" in s:
        return (
            f"## Results — {low}→{high} cores\n\nFAILED this run "
            f"(shared-VM interference/memory pressure):\n```\n{s['failed']}\n```\n"
        )
    r_low, r_high = s["low"], s["high"]
    return f"""## Results — {low}→{high} cores

| cores | seconds | docs/sec | triples/sec | busy core-s | steal core-s |
|---|---|---|---|---|---|
| local[{low}] (pinned {low} CPUs) | {r_low["sec"]} | {r_low["docs_per_sec"]} | {r_low["triples_per_sec"]} | {r_low["busy_core_s"]} | {r_low["steal_core_s"]} |
| local[{high}] (pinned {high} CPUs) | {r_high["sec"]} | {r_high["docs_per_sec"]} | {r_high["triples_per_sec"]} | {r_high["busy_core_s"]} | {r_high["steal_core_s"]} |

All trials — low: {fmt_trials(s["low_trials"])}
All trials — high: {fmt_trials(s["high_trials"])}

- speedup {low}→{high} cores: **{s["speedup"]}×** (ideal {high // low}×)
- scaling efficiency: **{s["efficiency"]}** (target ≥ 0.8 per BASELINE.json)
- triples: {r_low["n_triples"]} == {r_high["n_triples"]} (plan-invariant across parallelism)
"""


def main() -> None:
    n_pages = int(sys.argv[1]) if len(sys.argv) > 1 else 100000
    raw = [int(a) for a in sys.argv[2:]]
    pairs = list(zip(raw[0::2], raw[1::2])) if raw else [(4, 16), (8, 32)]

    pages_dir = ensure_pages(n_pages)
    summaries = []
    for low, high in pairs:
        try:
            s = measure_pair(low, high, n_pages, pages_dir)
        except RuntimeError as exc:  # record the failure, keep other pairs
            print(f"PAIR {low}->{high} FAILED: {exc}", file=sys.stderr)
            summaries.append(
                {"low_cores": low, "high_cores": high, "failed": str(exc)[:800]}
            )
            continue
        print(json.dumps(s, indent=2))
        summaries.append(s)

    os.makedirs(os.path.join(REPO, "BENCH"), exist_ok=True)
    path = os.path.join(REPO, "BENCH", "BASELINE.md")
    stamp = time.strftime("%Y-%m-%d %H:%M UTC", time.gmtime())

    sections = "\n".join(pair_section(s) for s in summaries)
    with open(path, "w") as f:
        f.write(f"""# BENCH/BASELINE — throughput + scaling evidence

Generated by `scripts/scaling_run.py` on {stamp}.

## Workload

Full KG-construction pipeline (on-disk Common-Crawl-style pages parquet →
html-heading chunking → content filter → tuple_v1 extraction with 1 gleaning
pass → canonicalization → nodes/edges/triples; fused single-Python-pass
extraction plan) on {n_pages} pages, identical input bytes at every level.

## Method (and why)

- Each level runs in a fresh subprocess **pinned with `taskset` to exactly
  k CPUs**. In Spark local mode, Python UDF workers are processes outside
  the JVM's task-slot accounting — an unpinned `local[4]` run was measured
  consuming ~2× its nominal cores, which silently flatters the baseline and
  destroys the efficiency ratio.
- One full warm-up pass per level (JVM JIT + Python worker forks: measured
  ~30 s one-time at 32 workers) precedes measurement; steady-state
  throughput is the honest proxy for a 100 TB multi-hour job.
- Best of 3 measured runs; per-run busy/steal core-seconds from /proc/stat
  are reported because this shared VM shows intermittent external slowdowns
  (steal spikes measured up to 5% of core-time during runs).
- The 4→16 pair leaves headroom on the 32-vCPU host so the high level is not
  throttled by machine-wide bandwidth. The 8→32 pair (VERDICT r2 #9) runs the
  high level against EVERY vCPU of the shared box, so host-saturation and
  external interference land directly on it — measured CPU inflation of the
  same job at 32-way parallelism was ~1.7×, an artifact a multi-host cluster
  does not share; the busy/steal columns quantify it per trial.

{sections}

## Plan properties backing the number

No driver-side loops in the hot path; the measured job is: parquet scan →
salted url-hash repartition → ONE fused mapInPandas stage (chunk + filter +
extract) → hash-partitioned groupBy aggregations (map-side partial agg) →
broadcast-free reduction to triples. Parallelism scales with partition count
(2×cores at all levels). See SCALE.md for the 10^12-document analysis.
""")
    print(f"wrote {path}")


if __name__ == "__main__":
    main()

#!/usr/bin/env python
"""Scaling-efficiency protocol (BENCH/BASELINE.md / north rule).

No real cluster exists in the sandbox, so the rule's "N vs 4N executors"
criterion is evidenced by running IDENTICAL jobs at two parallelism
levels (local[8] vs local[32]) on the same deterministic input, in
separate JVMs, and reporting throughput at both plus
efficiency = (throughput_4N / throughput_N) / 4.

Round 2 additions:
- the scaling run covers the flagship window/as-of pipeline AND the
  data-ops family (minhash LSH dedup, IVF ANN) over synthetic corpora
- a second scale tier (KAMAE_SCALING_TIER2_CONVS conversations,
  ~80M turns) runs once at 4N so BENCH history holds a two-point
  throughput curve, not a single point

Writes/updates BENCH/BASELINE.md. Run: python scripts/scaling_bench.py
(~45-70 min; never run other Spark work concurrently — it skews the
low-parallelism runs and inflates efficiency).
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
from datetime import datetime, timezone

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
CONVS = os.environ.get("KAMAE_SCALING_CONVS", "3000000")
TIER2_CONVS = os.environ.get("KAMAE_SCALING_TIER2_CONVS", "5000000")
DATA_OPS_N = os.environ.get("KAMAE_SCALING_DATA_OPS", "1000000")
N_LO, N_HI = (int(x) for x in os.environ.get("KAMAE_SCALING_LEVELS", "8,32").split(","))
REPEATS = int(os.environ.get("KAMAE_SCALING_REPEATS", "3"))

SCALED_QUERIES = ("feature_pipeline_synth", "minhash_lsh_synth", "ivf_topk_synth")


def run(cpus: int, convs: str, data_ops: str) -> dict:
    env = dict(
        os.environ,
        SPARK_GRAFT_CPUS=str(cpus),
        KAMAE_BENCH_SYNTH_CONVS=convs,
        KAMAE_BENCH_ONLY="synth",
        KAMAE_BENCH_DATA_OPS=data_ops,
        KAMAE_BENCH_DRIVER_MEM="48g",
    )
    out = subprocess.run(
        [sys.executable, os.path.join(REPO, "bench.py")],
        env=env, capture_output=True, text=True, timeout=3600,
    )
    line = [l for l in out.stdout.splitlines() if l.startswith("{")][-1]
    return json.loads(line)


def median_run(cpus: int) -> dict:
    """Median-of-N whole-JVM runs (by flagship wall): local-mode walls are
    noisy (JIT, GC, page cache); the median is the defensible number."""
    runs = sorted(
        (run(cpus, CONVS, DATA_OPS_N) for _ in range(REPEATS)),
        key=lambda r: r["queries"]["feature_pipeline_synth"],
    )
    return runs[len(runs) // 2]


def main() -> None:
    r_lo = median_run(N_LO)
    r_hi = median_run(N_HI)
    tier2 = run(N_HI, TIER2_CONVS, "0")

    def eff(q: str) -> float:
        return (r_lo["queries"][q] / r_hi["queries"][q]) / (N_HI / N_LO)

    tput_lo = r_lo["synth_turns"] / r_lo["queries"]["feature_pipeline_synth"]
    tput_hi = r_hi["synth_turns"] / r_hi["queries"]["feature_pipeline_synth"]
    tput_t2 = tier2["synth_turns"] / tier2["queries"]["feature_pipeline_synth"]
    flagship_eff = eff("feature_pipeline_synth")

    os.makedirs(os.path.join(REPO, "BENCH"), exist_ok=True)
    stamp = datetime.now(timezone.utc).strftime("%Y-%m-%d %H:%M UTC")
    per_query = "\n".join(
        f"| {q} | {r_lo['queries'][q]:.3f} | {r_hi['queries'][q]:.3f} | {eff(q):.3f} |"
        for q in SCALED_QUERIES if q in r_lo["queries"] and q in r_hi["queries"]
    )
    md = f"""# BENCH/BASELINE — scaling efficiency (N vs 4N protocol)

Measured {stamp}; identical deterministic inputs and code at both
parallelism levels, separate JVMs, warm-pass timing (noop write), median
of {REPEATS} whole-JVM runs per level.

Workloads:
- flagship feature pipeline (lag/lead + rolling aggregates +
  role-frequency + backfill + sessionization + listwise + as-of union
  join) over {r_lo['synth_turns']:,} synthetic transcript turns
  ({CONVS} conversations, Zipf-skewed lengths)
- minhash LSH near-dup pairs over {DATA_OPS_N} synthetic documents
  (word shingles, banded buckets, exact-jaccard verify)
- IVF ANN top-10 over {int(DATA_OPS_N) * 2:,} synthetic 64-dim
  embeddings (seeded k-means centroids, nprobe 8/64)

## Flagship throughput

| parallelism | wall sec | turns/sec |
|---|---|---|
| local[{N_LO}]  (N)  | {r_lo['queries']['feature_pipeline_synth']:.3f} | {tput_lo:,.0f} |
| local[{N_HI}] (4N) | {r_hi['queries']['feature_pipeline_synth']:.3f} | {tput_hi:,.0f} |

**Scaling efficiency = (throughput_4N / throughput_N) / {N_HI // N_LO} = {flagship_eff:.3f}**
(north-rule gate: >= 0.8)

## Per-workload walls and efficiency

| query | local[{N_LO}] sec | local[{N_HI}] sec | efficiency |
|---|---|---|---|
{per_query}

## Scale-tier curve (local[{N_HI}], flagship)

| tier | turns | wall sec | turns/sec |
|---|---|---|---|
| tier 1 ({CONVS} convs) | {r_hi['synth_turns']:,} | {r_hi['queries']['feature_pipeline_synth']:.3f} | {tput_hi:,.0f} |
| tier 2 ({TIER2_CONVS} convs) | {tier2['synth_turns']:,} | {tier2['queries']['feature_pipeline_synth']:.3f} | {tput_t2:,.0f} |

Round-over-round: compare BOTH tier rows — a regression that only shows
past memory/shuffle inflection points is invisible at a single scale.

Raw bench JSON:

```json
{json.dumps(r_lo)}
{json.dumps(r_hi)}
{json.dumps(tier2)}
```
"""
    with open(os.path.join(REPO, "BENCH", "BASELINE.md"), "w") as f:
        f.write(md)
    print(json.dumps({
        "tput_lo": round(tput_lo), "tput_hi": round(tput_hi),
        "tput_tier2": round(tput_t2),
        "efficiency_flagship": round(flagship_eff, 3),
        **{f"efficiency_{q}": round(eff(q), 3) for q in SCALED_QUERIES
           if q in r_lo["queries"] and q in r_hi["queries"]},
    }))


if __name__ == "__main__":
    main()

#!/usr/bin/env python
"""Scaling-efficiency protocol (BASELINE.md / north rule).

No real cluster exists in the sandbox, so the rule's "N vs 4N executors"
criterion is evidenced by running the IDENTICAL flagship job at two
parallelism levels (local[8] vs local[32]) on the same deterministic
input, in separate JVMs, and reporting throughput at both plus
efficiency = (throughput_32 / throughput_8) / 4.

Writes/updates BENCH/BASELINE.md. Run: python scripts/scaling_bench.py
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
from datetime import datetime, timezone

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
CONVS = os.environ.get("KAMAE_SCALING_CONVS", "3000000")
N_LO, N_HI = (int(x) for x in os.environ.get("KAMAE_SCALING_LEVELS", "8,32").split(","))


REPEATS = int(os.environ.get("KAMAE_SCALING_REPEATS", "3"))


def run(cpus: int) -> dict:
    env = dict(
        os.environ,
        SPARK_GRAFT_CPUS=str(cpus),
        KAMAE_BENCH_SYNTH_CONVS=CONVS,
        KAMAE_BENCH_DRIVER_MEM="48g",
    )
    out = subprocess.run(
        [sys.executable, os.path.join(REPO, "bench.py")],
        env=env, capture_output=True, text=True, timeout=3600,
    )
    line = [l for l in out.stdout.splitlines() if l.startswith("{")][-1]
    return json.loads(line)


def median_run(cpus: int) -> dict:
    """Median-of-N whole-JVM runs: local-mode walls are noisy (JIT, GC,
    page cache); the median is the defensible number."""
    runs = sorted(
        (run(cpus) for _ in range(REPEATS)),
        key=lambda r: r["queries"]["feature_pipeline_synth"],
    )
    return runs[len(runs) // 2]


def main() -> None:
    r8 = median_run(N_LO)
    r32 = median_run(N_HI)
    tput8 = r8["synth_turns"] / r8["queries"]["feature_pipeline_synth"]
    tput32 = r32["synth_turns"] / r32["queries"]["feature_pipeline_synth"]
    eff = (tput32 / tput8) / 4
    os.makedirs(os.path.join(REPO, "BENCH"), exist_ok=True)
    stamp = datetime.now(timezone.utc).strftime("%Y-%m-%d %H:%M UTC")
    md = f"""# BENCH/BASELINE — scaling efficiency (N vs 4N protocol)

Measured {stamp}; flagship feature pipeline (lag/lead + rolling aggregates +
role-frequency + backfill + sessionization + listwise + as-of union join)
over the deterministic synthetic transcript table
({r8['synth_turns']:,} turns, {CONVS} conversations, Zipf-skewed lengths),
identical input and code at both parallelism levels, separate JVMs,
timed on the second (warm) end-to-end pass with a noop write; median of
{REPEATS} whole-JVM runs per level.

| parallelism | wall sec | turns/sec |
|---|---|---|
| local[{N_LO}]  (N)  | {r8['queries']['feature_pipeline_synth']:.3f} | {tput8:,.0f} |
| local[{N_HI}] (4N) | {r32['queries']['feature_pipeline_synth']:.3f} | {tput32:,.0f} |

**Scaling efficiency = (throughput_4N / throughput_N) / 4 = {eff:.3f}**
(north-rule gate: >= 0.8)

Raw bench JSON:

```json
{json.dumps(r8)}
{json.dumps(r32)}
```
"""
    with open(os.path.join(REPO, "BENCH", "BASELINE.md"), "w") as f:
        f.write(md)
    print(json.dumps({"tput8": round(tput8), "tput32": round(tput32), "efficiency": round(eff, 3)}))


if __name__ == "__main__":
    main()

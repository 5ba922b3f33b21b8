#!/usr/bin/env python
"""Round-4 experiment: shave the local[32] flagship wall (the 8->32
efficiency gate needs <= 11.13s given the measured 35.63s at local[8]).
Each config runs in its own JVM at the REAL measurement scale (3M convs,
47M turns) so fixed costs weigh exactly as in scaling_bench. 32-core
only — the goal is a 4N-biased win; the winner gets validated at 8."""

from __future__ import annotations

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

WORKER = """
import json, os, sys, time
sys.path.insert(0, {repo!r})
from pyspark.sql import SparkSession
cfg = json.loads(os.environ["EXP_CFG"])
cpus = int(os.environ["EXP_CPUS"])
b = (SparkSession.builder.master(f"local[{{cpus}}]")
     .config("spark.sql.session.timeZone","UTC")
     .config("spark.ui.enabled","false")
     .config("spark.driver.memory","48g"))
for k, v in cfg.items():
    b = b.config(k, str(v))
if os.path.isdir("/dev/shm"):
    b = b.config("spark.local.dir", "/dev/shm/kamae-exp4n")
spark = b.getOrCreate()
spark.sparkContext.setLogLevel("ERROR")
from kamae_spark.sources.synth import transcripts_table, annotations_table
import bench
t = transcripts_table(spark, n_convs=3000000).cache()
n = t.count()
ann = annotations_table(spark, t)
out = bench._feature_model(ann).transform(t)
out.write.format("noop").mode("overwrite").save()  # warm
best = 1e9
for _ in range(2):
    t0 = time.perf_counter()
    out.write.format("noop").mode("overwrite").save()
    best = min(best, time.perf_counter() - t0)
print(json.dumps({{"n": n, "sec": round(best,3), "tput": round(n/best)}}))
spark.stop()
"""

BASE = {
    "spark.sql.shuffle.partitions": "128",
    "spark.sql.adaptive.enabled": "true",
    "spark.sql.adaptive.coalescePartitions.enabled": "false",
    "spark.shuffle.compress": "false",
    "spark.shuffle.spill.compress": "false",
}

CONFIGS = {
    "base": {},
    "parallel_gc": {"spark.driver.extraJavaOptions": "-XX:+UseParallelGC"},
    "offheap16g": {"spark.memory.offHeap.enabled": "true",
                   "spark.memory.offHeap.size": "16g"},
    "shuffle256": {"spark.sql.shuffle.partitions": "256"},
    "cache_nocompress": {"spark.sql.inMemoryColumnarStorage.compressed": "false"},
    "gc_offheap": {"spark.driver.extraJavaOptions": "-XX:+UseParallelGC",
                   "spark.memory.offHeap.enabled": "true",
                   "spark.memory.offHeap.size": "16g"},
}


def run(name: str, cpus: int) -> dict:
    cfg = dict(BASE)
    cfg.update(CONFIGS[name])
    env = dict(os.environ, EXP_CFG=json.dumps(cfg), EXP_CPUS=str(cpus))
    out = subprocess.run([sys.executable, "-c", WORKER.format(repo=REPO)],
                         env=env, capture_output=True, text=True, timeout=1800)
    lines = [l for l in out.stdout.splitlines() if l.startswith("{")]
    if not lines:
        return {"error": out.stderr[-300:]}
    return json.loads(lines[-1])


if __name__ == "__main__":
    names = sys.argv[1:] or list(CONFIGS)
    cpus = int(os.environ.get("EXP_CPUS", "32"))
    for name in names:
        with open("/proc/loadavg") as f:
            load_before = f.read().split()[0]
        r = run(name, cpus)
        print(json.dumps({"config": name, "cpus": cpus,
                          "load_before": load_before, **r}), flush=True)

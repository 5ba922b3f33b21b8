#!/usr/bin/env python
"""One-off experiment: find configs that maximize N->4N scaling efficiency
of the flagship pipeline. Each (config, cpus) runs in its own JVM via
subprocess to avoid cross-contamination."""

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
spark = b.getOrCreate()
spark.sparkContext.setLogLevel("ERROR")
from kamae_spark.sources.synth import transcripts_table, annotations_table
sys.path.insert(0, {repo!r})
import bench
t = transcripts_table(spark, n_convs=800000).cache()
n = t.count()
ann = annotations_table(spark, t)
out = bench._feature_model(ann).transform(t)
out.write.format("noop").mode("overwrite").save()  # warm
best = 1e9
for _ in range(2):
    t0 = time.perf_counter()
    out.write.format("noop").mode("overwrite").save()
    best = min(best, time.perf_counter() - t0)
print(json.dumps({{"n": n, "sec": best, "tput": n/best}}))
spark.stop()
"""


def run(cfg: dict, cpus: int) -> dict:
    env = dict(os.environ, EXP_CFG=json.dumps(cfg), EXP_CPUS=str(cpus))
    code = WORKER.format(repo=REPO)
    out = subprocess.run([sys.executable, "-c", code], env=env,
                         capture_output=True, text=True, timeout=1200)
    lines = [l for l in out.stdout.splitlines() if l.startswith("{")]
    if not lines:
        return {"error": out.stderr[-500:]}
    return json.loads(lines[-1])


CONFIGS = {
    "base": lambda cpus: {"spark.sql.shuffle.partitions": cpus * 2,
                          "spark.sql.adaptive.enabled": "true"},
    "shm_nocompress": lambda cpus: {
        "spark.sql.shuffle.partitions": cpus * 2,
        "spark.sql.adaptive.enabled": "true",
        "spark.local.dir": "/dev/shm/spark-exp",
        "spark.shuffle.compress": "false",
        "spark.shuffle.spill.compress": "false",
    },
    "shm_eq_parts": lambda cpus: {
        "spark.sql.shuffle.partitions": 128,
        "spark.sql.adaptive.enabled": "false",
        "spark.local.dir": "/dev/shm/spark-exp",
        "spark.shuffle.compress": "false",
        "spark.shuffle.spill.compress": "false",
    },
    "shm_noaqe": lambda cpus: {
        "spark.sql.shuffle.partitions": cpus * 4,
        "spark.sql.adaptive.enabled": "false",
        "spark.local.dir": "/dev/shm/spark-exp",
        "spark.shuffle.compress": "false",
    },
}


def main() -> None:
    names = sys.argv[1:] or list(CONFIGS)
    for name in names:
        fn = CONFIGS[name]
        r8 = run(fn(8), 8)
        r32 = run(fn(32), 32)
        if "error" in r8 or "error" in r32:
            print(name, "ERROR", r8.get("error", ""), r32.get("error", ""))
            continue
        eff = (r32["tput"] / r8["tput"]) / 4
        print(json.dumps({"config": name, "tput8": round(r8["tput"]),
                          "tput32": round(r32["tput"]), "eff": round(eff, 3)}))


if __name__ == "__main__":
    main()

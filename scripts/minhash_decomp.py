#!/usr/bin/env python
"""Per-stage minhash scaling decomposition (VERDICT r4 #1 fallback).

If the end-to-end minhash 4->16 efficiency lands under the 0.8 gate,
this script attributes the shortfall per stage. It times, in separate
forced jobs at each parallelism level:

  sig   — shingle + explode-grams + per-perm min agg (the signature
          stage: ~0.5B gram rows at 4M docs, memory-bandwidth heavy)
  pairs — banding + _bucket_pairs candidate generation
  e2e   — the full minhash_lsh_pairs (for cross-checking: e2e ~= the
          stages it dominates)

Usage: KAMAE_DECOMP_DOCS=4000000 KAMAE_DECOMP_LEVELS=4,16 \
       python scripts/minhash_decomp.py
Each (stage, level) runs in its own JVM (subprocess) so JIT/cache
state cannot leak across levels. Prints one JSON line per run and a
summary with per-stage efficiencies.

NOTE: run on a quiet host; this script reuses bench.py's in-process
load measurement to tag each run with the neighbor load it saw.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

DOCS = int(os.environ.get("KAMAE_DECOMP_DOCS", "4000000"))
LEVELS = [int(x) for x in os.environ.get("KAMAE_DECOMP_LEVELS", "4,16").split(",")]
STAGES = os.environ.get("KAMAE_DECOMP_STAGES", "sig,pairs,e2e").split(",")

_WORKER = r"""
import json, os, sys, time
sys.path.insert(0, os.environ["KAMAE_REPO"])
import bench  # reuse _total_busy_jiffies/_tree_jiffies/_force

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

cpus = int(os.environ["KAMAE_DECOMP_CPUS"])
docs = int(os.environ["KAMAE_DECOMP_DOCS"])
stage = os.environ["KAMAE_DECOMP_STAGE"]

spark = (
    SparkSession.builder.master(f"local[{cpus}]")
    .config("spark.sql.shuffle.partitions", str(max(cpus * 4, 16)))
    .config("spark.sql.adaptive.enabled", "true")
    .config("spark.sql.adaptive.coalescePartitions.enabled", "false")
    .config("spark.shuffle.compress", "false")
    .config("spark.shuffle.spill.compress", "false")
    .config("spark.driver.memory", "48g")
    .config("spark.local.dir", "/dev/shm/kamae-bench")
    .config("spark.ui.enabled", "false")
    .getOrCreate()
)
spark.sparkContext.setLogLevel("ERROR")

from kamae_spark.data.dedup import (
    _bucket_pairs, _signatures_from_grams, minhash_band_plan,
    minhash_lsh_pairs, shingles,
)
from kamae_spark.sources.synth import documents_table

d = documents_table(spark, n_docs=docs).cache()
d.count()

num_perm, n, tokenizer, threshold = 64, 2, "word", 0.6
bands = minhash_band_plan(num_perm, threshold)
rows_per_band = num_perm // bands

src = d.select(F.col("doc_id").alias("__id"), F.col("text").alias("__t"))
gsel = src.select("__id", shingles(F.col("__t"), n, tokenizer).alias("__g"))
base = _signatures_from_grams(gsel, num_perm)

if stage == "sig":
    target = base
elif stage == "pairs":
    band_structs = [
        F.struct(
            F.lit(b).alias("band"),
            F.xxhash64(*[F.try_element_at("__sig", F.lit(b * rows_per_band + k + 1))
                         for k in range(rows_per_band)]).alias("bucket"),
        )
        for b in range(bands)
    ]
    band = base.select("__id", F.explode(F.array(*band_structs)).alias("bb")).select(
        "__id", F.col("bb.band").alias("band"), F.col("bb.bucket").alias("bucket"))
    target = _bucket_pairs(band)
else:
    target = minhash_lsh_pairs(d, "text", "doc_id", n=n, num_perm=num_perm,
                               tokenizer=tokenizer, threshold=threshold)

bench._force(target)  # warm
wall, other = bench._timed_pass(target)
print(json.dumps({"stage": stage, "cpus": cpus, "docs": docs,
                  "wall": round(wall, 2), "other_cores_avg": round(other, 2)}))
spark.stop()
"""


def main() -> None:
    results: dict[tuple[str, int], dict] = {}
    for stage in STAGES:
        for cpus in LEVELS:
            env = dict(os.environ, KAMAE_REPO=REPO, KAMAE_DECOMP_CPUS=str(cpus),
                       KAMAE_DECOMP_DOCS=str(DOCS), KAMAE_DECOMP_STAGE=stage)
            out = subprocess.run([sys.executable, "-c", _WORKER], env=env,
                                 capture_output=True, text=True, timeout=5400)
            if out.returncode != 0:
                print(out.stderr[-2000:], file=sys.stderr)
                raise SystemExit(f"{stage}@local[{cpus}] failed")
            rec = json.loads([l for l in out.stdout.splitlines()
                              if l.startswith("{")][-1])
            results[(stage, cpus)] = rec
            print(json.dumps(rec), flush=True)
    lo, hi = LEVELS[0], LEVELS[-1]
    ratio = hi / lo
    summary = {
        f"{s}_eff": round(results[(s, lo)]["wall"] / results[(s, hi)]["wall"] / ratio, 3)
        for s in STAGES if (s, lo) in results and (s, hi) in results
    }
    print(json.dumps({"levels": LEVELS, "docs": DOCS, **summary}))


if __name__ == "__main__":
    main()

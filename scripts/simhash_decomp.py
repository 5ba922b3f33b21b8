#!/usr/bin/env python
"""Per-stage simhash scaling decomposition (VERDICT r5 #3).

The r5 scaling run measured simhash_synth 4->16 efficiency 0.677 (the
one clean under-gate number) while minhash's near-identical shape read
0.927. This script attributes the shortfall per stage, in separate
forced jobs at each parallelism level:

  tok   — docs -> lower/split token arrays (scan + codegen only)
  sig   — simhash_signatures_jvm end-to-end (explode tokens ->
          xxhash64 -> 64 signed bit-count sum aggs -> sign assembly)
  pairs — band keys + _bucket_pairs candidate generation from sigs
  e2e   — full simhash_pairs_from_sigs(sigs) incl. hamming verify

Usage: KAMAE_DECOMP_DOCS=1000000 KAMAE_DECOMP_LEVELS=4,16 \
       python scripts/simhash_decomp.py
Each (stage, level) runs in its own JVM (subprocess). Prints one JSON
line per run and a summary with per-stage efficiencies; each run is
tagged with bench.py's neighbor-load reading.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

DOCS = int(os.environ.get("KAMAE_DECOMP_DOCS", "1000000"))
LEVELS = [int(x) for x in os.environ.get("KAMAE_DECOMP_LEVELS", "4,16").split(",")]
STAGES = os.environ.get("KAMAE_DECOMP_STAGES", "tok,sig,pairs,e2e").split(",")

_WORKER = r"""
import json, os, sys, time
sys.path.insert(0, os.environ["KAMAE_REPO"])
import bench  # reuse _timed_pass/_force

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
    _bucket_pairs, simhash_band_keys, simhash_pairs_from_sigs,
    simhash_signatures_jvm,
)
from kamae_spark.sources.synth import documents_table

d = documents_table(spark, n_docs=docs).cache()
d.count()
toks = d.select("doc_id", F.split(F.lower("text"), r"\s+").alias("toks"))

if stage == "tok":
    target = toks
elif stage == "sig":
    target = simhash_signatures_jvm(toks, "toks", "doc_id")
elif stage == "pairs":
    sigs = simhash_signatures_jvm(toks, "toks", "doc_id")
    banded = sigs.select(
        "__id", "__sig",
        F.explode(simhash_band_keys(F.col("__sig"), 4)).alias("bb"),
    ).select("__id", "__sig", F.col("bb.band").alias("band"),
             F.col("bb.key").alias("bucket"))
    target = _bucket_pairs(banded, payload=("__sig",))
else:
    sigs = simhash_signatures_jvm(toks, "toks", "doc_id")
    target = simhash_pairs_from_sigs(sigs, "__sig", "__id", max_hamming=3)

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

#!/usr/bin/env python
"""Round-6 measurement harness (guide §1): times the SAME queries as the
frozen bench.py (same session profile, same noop-sink methodology) but
with per-query selection, configurable pass counts, and
``.explain("formatted")`` capture for the plans/r06 evidence files.

This file is NOT part of the driver contract — bench.py stays frozen;
numbers quoted in OPTIMIZATION_r06.md cite this harness for isolation
runs and bench.py itself for the headline protocol.

Usage:
  python bench_extra.py [--sf DIR] [--passes N] [--explain-dir DIR]
                        [--queries a,b,c] [--stage-breakdown]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))


def _session():
    # identical profile to bench.py _session (frozen); see bench.py for
    # the rationale of each setting
    for var in ("OPENBLAS_NUM_THREADS", "OMP_NUM_THREADS",
                "MKL_NUM_THREADS", "NUMEXPR_NUM_THREADS"):
        os.environ.setdefault(var, "1")
    from pyspark.sql import SparkSession

    b = (
        SparkSession.builder.master(f"local[{CPUS}]")
        .appName("kamae_spark-bench-extra")
        .config("spark.sql.shuffle.partitions", str(max(CPUS * 4, 16)))
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "false")
        .config("spark.shuffle.compress", "false")
        .config("spark.shuffle.spill.compress", "false")
        .config("spark.driver.memory", os.environ.get("KAMAE_BENCH_DRIVER_MEM", "24g"))
        .config("spark.ui.enabled", "false")
    )
    if os.path.isdir("/dev/shm"):
        b = b.config("spark.local.dir", "/dev/shm/kamae-bench-extra")
    return b.getOrCreate()


def _force(df) -> None:
    df.write.format("noop").mode("overwrite").save()


def _time(df, n: int) -> list[float]:
    walls = []
    for _ in range(n):
        t0 = time.perf_counter()
        _force(df)
        walls.append(round(time.perf_counter() - t0, 3))
    return walls


def build_queries(spark, sf_dir: str, synth_convs: int):
    """(name -> DataFrame) for every query the frozen bench.py times,
    constructed the same way (warm caches included where bench caches)."""
    import __spark_entry__ as entrymod
    import bench as benchmod
    from kamae_spark.data.dedup import minhash_lsh_pairs
    from kamae_spark.sources.synth import annotations_table, transcripts_table
    from pyspark.sql import functions as F  # noqa: F401

    out = {}
    qmap = entrymod.queries()
    for name in ["w_lag_lead", "w_rolling", "w_backfill", "w_sessionize",
                 "w_list_stats", "asof_join", "exact_dedup", "ann_topk",
                 "text_stats"]:
        out[name] = lambda name=name: qmap[name](spark, sf_dir)

    def mh():
        d = spark.read.parquet(f"{sf_dir}/documents.parquet")
        return minhash_lsh_pairs(d, "text", "doc_id", n=2, num_perm=64,
                                 bands=8, threshold=0.6, tokenizer="word")
    out["minhash_lsh"] = mh

    def fpe():
        t = entrymod._transcripts(spark, sf_dir).cache()
        t.count()
        ann = entrymod._annotations(spark, sf_dir)
        return benchmod._feature_model(ann).transform(t)
    out["feature_pipeline_events"] = fpe

    def vocab():
        from kamae_spark.operators.indexers import StringIndexEstimator
        n_vocab = 2_000_000
        base = spark.range(n_vocab * 5).select(
            F.concat(F.lit("lbl_"),
                     F.pmod(F.xxhash64("id"), F.lit(n_vocab)).cast("string")
                     ).alias("label")).cache()
        base.count()
        model = StringIndexEstimator(input_col="label",
                                     output_col="label_idx").fit(base)
        return model.transform(base)
    out["vocab_index_synth"] = vocab

    def fps():
        synth = transcripts_table(spark, n_convs=synth_convs).cache()
        synth.count()
        ann_s = annotations_table(spark, synth)
        return benchmod._feature_model(ann_s).transform(synth)
    out["feature_pipeline_synth"] = fps
    return out


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default=os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf1.0"))
    ap.add_argument("--passes", type=int, default=3)
    ap.add_argument("--queries", default="")
    ap.add_argument("--explain-dir", default="")
    ap.add_argument("--explain-suffix", default="before")
    ap.add_argument("--synth-convs", type=int,
                    default=int(os.environ.get("KAMAE_BENCH_SYNTH_CONVS",
                                               "500000")))
    args = ap.parse_args()

    spark = _session()
    spark.sparkContext.setLogLevel("ERROR")
    builders = build_queries(spark, args.sf, args.synth_convs)
    names = [q for q in args.queries.split(",") if q] or list(builders)

    results = {}
    for name in names:
        spark.sparkContext.setJobDescription(f"bench_extra: {name}")
        df = builders[name]()
        if args.explain_dir:
            os.makedirs(args.explain_dir, exist_ok=True)
            plan = df._sc._jvm.PythonSQLUtils.explainString(
                df._jdf.queryExecution(), "formatted")
            with open(os.path.join(
                    args.explain_dir,
                    f"{name}_{args.explain_suffix}.txt"), "w") as f:
                f.write(plan)
        _force(df)  # warm
        if args.passes > 0:
            results[name] = _time(df, args.passes)
            print(json.dumps({name: results[name]}), flush=True)
    print(json.dumps({
        "sf": args.sf, "cpus": CPUS,
        "min_total": round(sum(min(w) for w in results.values()), 3),
        "queries_min": {k: min(v) for k, v in results.items()},
        "queries": results,
    }))
    spark.stop()


if __name__ == "__main__":
    main()

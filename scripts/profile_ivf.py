#!/usr/bin/env python
"""Stage-level profile of ivf_topk at bench scale — diagnosing the
N-vs-4N anomaly (local[32] measured SLOWER than local[8] at 2M vecs in
the round-3 scaling runs). Usage: python scripts/profile_ivf.py [cpus].

Replicates bench.py's session profile exactly, then times each stage of
the IVF plan separately with noop writes (best of 2)."""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

CPUS = int(sys.argv[1]) if len(sys.argv) > 1 else 32
N_VECS = int(os.environ.get("PROF_VECS", "2000000"))


def timed(df, n=2):
    best = float("inf")
    for _ in range(n):
        t0 = time.perf_counter()
        df.write.format("noop").mode("overwrite").save()
        best = min(best, time.perf_counter() - t0)
    return round(best, 3)


def main():
    from pyspark.sql import SparkSession
    from pyspark.sql import functions as F

    b = (
        SparkSession.builder.master(f"local[{CPUS}]")
        .appName("profile-ivf")
        .config("spark.sql.shuffle.partitions", str(max(CPUS * 4, 16)))
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "false")
        .config("spark.shuffle.compress", "false")
        .config("spark.shuffle.spill.compress", "false")
        .config("spark.driver.memory", os.environ.get("KAMAE_BENCH_DRIVER_MEM", "48g"))
        .config("spark.ui.enabled", "false")
    )
    if os.path.isdir("/dev/shm"):
        b = b.config("spark.local.dir", "/dev/shm/kamae-prof")
    spark = b.getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    from kamae_spark.data.similarity import (
        _bucket_udfs, _topk_per_query, cosine_pairs_udf, fit_centroids, ivf_topk,
    )
    from kamae_spark.sources.synth import embeddings_table

    emb = embeddings_table(spark, n_vecs=N_VECS, dim=64, n_clusters=256).cache()
    print("n_vecs", emb.count(), "cpus", CPUS, flush=True)
    q8 = emb.where(emb.vec_id < 16)

    t0 = time.perf_counter()
    cents = fit_centroids(emb, "embedding", 64, seed=42)
    print("fit_centroids_sec", round(time.perf_counter() - t0, 3), flush=True)

    assign1, topn = _bucket_udfs(cents)
    c = emb.select(
        F.col("vec_id").alias("neighbor_id"),
        F.col("embedding").alias("__cv"),
        assign1(F.col("embedding")).alias("bucket"),
    )
    print("assign_sec", timed(c), flush=True)

    q = q8.select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("__qv"),
        F.explode(topn(8)(F.col("embedding"))).alias("bucket"),
    )
    joined = (
        c.join(F.broadcast(q), ["bucket"])
        .where(F.col("query_id") != F.col("neighbor_id"))
    )
    print("join_rows", joined.count(), flush=True)
    scored = joined.select(
        "query_id", "neighbor_id",
        F.round(cosine_pairs_udf()(F.col("__qv"), F.col("__cv")), 6).alias("score"),
    )
    print("scored_sec", timed(scored), flush=True)
    print("topk_salted_sec", timed(_topk_per_query(scored, 10, 32)), flush=True)
    print("topk_single_sec", timed(_topk_per_query(scored, 10, 0)), flush=True)

    full = ivf_topk(emb, q8, "embedding", "vec_id", k=10, n_centroids=64, nprobe=8)
    full.write.format("noop").mode("overwrite").save()  # warm like bench
    print("full_ivf_sec", timed(full), flush=True)
    spark.stop()


if __name__ == "__main__":
    main()

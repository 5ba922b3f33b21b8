#!/usr/bin/env python
"""Benchmark harness (driver contract, BASELINE.md protocol).

Runs the headline feature-engineering queries at ``$SPARK_GRAFT_SF_DIR``
(default /root/testdata/sf0.1) on ``local[$SPARK_GRAFT_CPUS]`` and prints
ONE JSON line::

  {"metric": "...", "value": <sec>, "unit": "sec",
   "queries": {...}, "sf": ..., "turns": N, "turns_per_sec": T}

Each query is forced end-to-end with a noop-format write (full
computation of every column, no disk cost). The flagship throughput
number (turns/sec, the BASELINE.json north metric) also runs over a
deterministic JVM-side synthetic transcript table ~10x the events table
so timing is not dominated by session overhead at small SF.

Scaling protocol (north rule: efficiency >= 0.8 from N to 4N): run
``python scripts/scaling_bench.py`` — executes this file at
SPARK_GRAFT_CPUS=8 and 32 on identical input and reports both
throughputs + efficiency into BENCH/BASELINE.md.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
SYNTH_CONVS = int(os.environ.get("KAMAE_BENCH_SYNTH_CONVS", "500000"))


def _session():
    """Tuned local-mode profile (measured in scripts/scaling_experiment.py):
    - shuffle partitions = 4x cores: enough tasks that every core stays
      busy through stage tails (2x lost ~10% scaling efficiency)
    - AQE on but coalescing OFF: coalescing merges the small window
      shuffles down and strands cores at high parallelism
    - tmpfs shuffle dir + no shuffle compression: local mode has no
      network, so compression only burns CPU on a memory-speed "disk"
    On a real cluster, re-enable compression (network-bound) and AQE
    coalescing (wide plans); these are local-measurement settings.
    """
    from pyspark.sql import SparkSession

    b = (
        SparkSession.builder.master(f"local[{CPUS}]")
        .appName("kamae_spark-bench")
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
        b = b.config("spark.local.dir", "/dev/shm/kamae-bench")
    return b.getOrCreate()


def _force(df) -> None:
    """Compute every column end-to-end (no disk cost, no column pruning)."""
    df.write.format("noop").mode("overwrite").save()


def _time_best(df, n: int | None = None) -> float:
    """Best-of-n timed full executions (the host is a shared VM; single
    samples vary ~3x with neighbor load). KAMAE_BENCH_TIMED_PASSES
    overrides n — the amortizing-wall scaling phases run a single timed
    pass (>=60s walls don't need best-of-2 and the repeat doubles the
    suite's wall cost)."""
    if n is None:
        n = int(os.environ.get("KAMAE_BENCH_TIMED_PASSES", "2"))
    best = float("inf")
    for _ in range(n):
        t0 = time.perf_counter()
        _force(df)
        best = min(best, time.perf_counter() - t0)
    return round(best, 3)


def _feature_model(ann):
    from kamae_spark.core.pipeline import PipelineModel
    from kamae_spark.operators.joins import AsOfJoin
    from kamae_spark.operators.windows import (
        Backfill,
        ConditionalRollingCount,
        Lag,
        Lead,
        ListAgg,
        RollingAgg,
        Sessionize,
    )

    order = ("ts", "turn_idx")
    return PipelineModel(
        [
            Lag(input_col="text", output_col="prev_text", order_by=order),
            Lead(input_col="text", output_col="next_text", order_by=order),
            Lag(input_col="ts", output_col="prev_ts", order_by=order),
            RollingAgg(input_col="turn_idx", output_col="turns_5", agg="count", rows=5, order_by=order),
            RollingAgg(input_col="turn_idx", output_col="mean_10", agg="mean", rows=10, order_by=order),
            ConditionalRollingCount(input_col="role", output_col="role_freq_10", value="assistant", rows=10, order_by=order),
            Backfill(input_col="tool", output_col="tool_ff", order_by=order),
            Sessionize(ts_col="ts", output_col="session_idx", gap_seconds=1800, order_by=order, session_id_col="session_id"),
            ListAgg(input_col="turn_idx", output_col="conv_len", agg="count"),
            AsOfJoin(on=("conv_id",), right=ann, strategy="union"),
        ]
    )


def main() -> None:
    import __spark_entry__ as entrymod
    from kamae_spark.sources.synth import annotations_table, transcripts_table

    spark = _session()
    spark.sparkContext.setLogLevel("ERROR")
    queries: dict[str, float] = {}
    extras: dict[str, float] = {}
    synth_only = os.environ.get("KAMAE_BENCH_ONLY") == "synth"

    if not synth_only:
        # -- per-operator queries over the SF-dir events table -------------
        per_op = ["w_lag_lead", "w_rolling", "w_backfill", "w_sessionize",
                  "w_list_stats", "asof_join",
                  "exact_dedup", "ann_topk", "text_stats"]
        qmap = entrymod.queries()
        for name in per_op:
            if name not in qmap:
                continue
            df = qmap[name](spark, SF_DIR)
            df.count()  # warm: parquet footer reads, plan analysis
            queries[name] = _time_best(df)

        # minhash with the PRODUCTION S-curve banding (rounds 1-2 measured
        # this setting; the driver query now uses one-row-per-band for its
        # exhaustive-recall oracle, which would quadratically over-generate
        # candidates here and measure the oracle, not the operator)
        from kamae_spark.data.dedup import minhash_lsh_pairs as _mh

        d = spark.read.parquet(f"{SF_DIR}/documents.parquet")
        mh_prod = _mh(d, "text", "doc_id", n=2, num_perm=64, bands=8,
                      threshold=0.6, tokenizer="word")
        mh_prod.count()  # warm
        queries["minhash_lsh"] = _time_best(mh_prod)

        # -- flagship end-to-end over events-derived transcripts -----------
        t = entrymod._transcripts(spark, SF_DIR).cache()
        n_events = t.count()
        ann = entrymod._annotations(spark, SF_DIR)
        model = _feature_model(ann)
        out = model.transform(t)
        _force(out)  # warm
        queries["feature_pipeline_events"] = _time_best(out)
        extras["events_turns"] = n_events
        t.unpersist()

    # -- data-ops over synthetic corpora (scaling-run participants) --------
    # KAMAE_BENCH_DATA_OPS=N is the legacy combined knob (minhash over N
    # docs + IVF over 2N vecs); the per-op knobs below override it so the
    # scaling protocol can run each op alone at its amortizing scale
    n_data = int(os.environ.get("KAMAE_BENCH_DATA_OPS", "0"))
    n_mh = int(os.environ.get("KAMAE_BENCH_MINHASH_DOCS", str(n_data)))
    n_vecs = int(os.environ.get("KAMAE_BENCH_IVF_VECS", str(n_data * 2)))
    if n_mh:
        from kamae_spark.data.dedup import minhash_lsh_pairs
        from kamae_spark.sources.synth import documents_table

        docs = documents_table(spark, n_docs=n_mh).cache()
        docs.count()
        mh = minhash_lsh_pairs(docs, "text", "doc_id", n=2, tokenizer="word",
                               threshold=0.6)
        _force(mh)  # warm
        queries["minhash_lsh_synth"] = _time_best(mh)
        extras["synth_docs"] = n_mh
        docs.unpersist()

    if n_vecs:
        # the assignment pass must be >=10s at 4N or fixed overheads
        # (Arrow worker startup, stage barriers) dominate and the
        # efficiency measurement is meaningless; the query batch /
        # centroid count are tunable so the scaling run can use a
        # realistic batch (thousands of queries) at amortizing walls
        from kamae_spark.data.similarity import ivf_topk
        from kamae_spark.sources.synth import embeddings_table

        n_q = int(os.environ.get("KAMAE_BENCH_IVF_QUERIES", "16"))
        n_cent = int(os.environ.get("KAMAE_BENCH_IVF_CENTROIDS", "64"))
        nprobe = int(os.environ.get("KAMAE_BENCH_IVF_NPROBE", "8"))
        emb = embeddings_table(spark, n_vecs=n_vecs, dim=64, n_clusters=256).cache()
        emb.count()
        q8 = emb.where(emb.vec_id < n_q)
        ivf = ivf_topk(emb, q8, "embedding", "vec_id", k=10,
                       n_centroids=n_cent, nprobe=nprobe)
        _force(ivf)  # warm (includes centroid fit)
        queries["ivf_topk_synth"] = _time_best(ivf)
        extras["synth_vecs"] = n_vecs
        extras["ivf_queries"] = n_q
        emb.unpersist()

    # -- flagship over synthetic transcripts (~10x the events rows) -------
    if SYNTH_CONVS:
        synth = transcripts_table(spark, n_convs=SYNTH_CONVS).cache()
        n_synth = synth.count()
        ann_s = annotations_table(spark, synth)
        out_s = _feature_model(ann_s).transform(synth)
        _force(out_s)  # warm (JIT, cache residency)
        dt = _time_best(out_s)
        queries["feature_pipeline_synth"] = dt
        extras["synth_turns"] = n_synth
        extras["turns_per_sec"] = round(n_synth / dt, 1)
        synth.unpersist()

    total = round(sum(queries.values()), 3)
    print(
        json.dumps(
            {
                "metric": "feature_pipeline_total_sec",
                "value": total,
                "unit": "sec",
                "queries": queries,
                "sf": SF_DIR.rstrip("/").split("sf")[-1],
                "cpus": CPUS,
                **extras,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()

"""Scan-parallelism guard for heavy map-side operators.

The data-ops functions (fingerprint hashing, shingling, signature
aggregation, Arrow scoring) do their dominant work in the MAP stage, so
their wall inherits the input's partition count. Spark sizes file-scan
partitions from bytes (maxPartitionBytes / openCostInBytes), not from
work-per-byte: a corpus that fits one small parquet file reads as ONE
partition, and every downstream regex/hash/numpy pass serializes on a
single core regardless of cluster size — both a throughput loss and a
straggler exposure (guide §2.1, §2.5, §6.2).

``ensure_scan_parallelism`` redistributes such inputs to
``defaultParallelism`` partitions — hash-partitioned on the unique id
column when given (deterministic, skew-free, no sort-before-repartition
pass), round-robin otherwise. It is a NO-OP whenever the input already
has enough partitions, which is the normal case at production layouts
(file count >> core count) and for generated/cached tables, so no
production plan gains an exchange.

Apply it only where per-row CPU dominates the shuffled bytes (regex
normalization, digesting, shingling, per-token signature aggregation).
The vector scan paths (brute-force / IVF top-k, embedding near-dup)
deliberately skip it: their per-row work is a few FLOPs per dimension,
and shuffling heavy vector payloads to parallelize cheap math measured
a net loss (see kamae_spark/data/similarity.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def ensure_scan_parallelism(df: DataFrame, key: str | None = None) -> DataFrame:
    """Repartition ``df`` up to ``defaultParallelism`` partitions when it
    has fewer (see module docstring). ``key``: a unique-id column to
    hash-partition on; omitted, rows go round-robin.

    Partition inspection uses ``df.rdd.getNumPartitions()`` — free for
    file scans and cached tables (the intended inputs); on an exotic
    multi-stage upstream plan under AQE it may force upstream query
    stages early, which costs nothing overall (stage outputs are
    reused by the real action) but is why this helper is applied at
    data-op entry points, not arbitrary mid-plan positions."""
    sc = df.sparkSession.sparkContext
    target = sc.defaultParallelism
    if df.rdd.getNumPartitions() >= target:
        return df
    return df.repartition(target, key) if key is not None else df.repartition(target)

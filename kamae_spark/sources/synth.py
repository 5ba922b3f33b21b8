"""Deterministic synthetic transcript / annotation tables (FIXTURES.md F1/F8).

Fully JVM-side generation: conversation count in, `spark.range` +
`xxhash64`-derived pseudo-randoms + `explode(sequence(...))` out — no
driver-side loops, no Python RNG, so the SAME rows are produced at any
parallelism level and any scale (needed for the N-vs-4N scaling run and
for cross-engine oracles). Conversation lengths are skewed (a small
fraction of "hot" conversations hundreds of turns long) to exercise
skew handling, per FIXTURES.md F1.

Schema (BASELINE.json input_hint):
  conv_id string, turn_idx int, role string, text string,
  tool string (sparse ~80% null), ts timestamp
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

ROLES = ("user", "assistant", "system", "tool")
TOOLS = ("search", "code", "browser")
EPOCH = "2025-01-01 00:00:00"


def _h(*cols) -> "F.Column":
    return F.xxhash64(*cols)


def transcripts_table(
    spark: SparkSession,
    n_convs: int = 50,
    seed: int = 42,
    hot_every: int = 97,
    hot_len: int = 400,
) -> DataFrame:
    """Deterministic transcript table with ~`n_convs` conversations.

    Most conversations have 2–21 turns; every `hot_every`-th (by hash) is
    "hot" with `hot_len` extra turns. Gaps mix seconds-scale and >30-min
    jumps so sessionization splits; some consecutive turns share an equal
    ts (tie-break on turn_idx), per FIXTURES.md F1.
    """
    convs = spark.range(n_convs).select(
        F.concat(F.lit("conv_"), F.col("id").cast("string")).alias("conv_id"),
        F.col("id").alias("_cid"),
    )
    h = F.abs(_h("conv_id", F.lit(seed)))
    n_turns = 2 + F.pmod(h, F.lit(20)) + F.when(
        F.pmod(h, F.lit(hot_every)) == 0, F.lit(hot_len)
    ).otherwise(0)
    turns = convs.select(
        "conv_id",
        "_cid",
        F.explode(F.sequence(F.lit(0), (n_turns - 1).cast("int"))).alias("turn_idx"),
    )
    th = F.abs(_h("conv_id", "turn_idx", F.lit(seed)))
    role = F.element_at(F.array(*[F.lit(r) for r in ROLES]), (F.pmod(th, 4) + 1).cast("int"))
    tool = F.when(
        F.pmod(th, 5) == 0,
        F.element_at(F.array(*[F.lit(t) for t in TOOLS]), (F.pmod(th, 3) + 1).cast("int")),
    )
    text = F.concat_ws(
        " ",
        F.lit("msg"),
        F.col("conv_id"),
        F.col("turn_idx").cast("string"),
        F.repeat(F.lit("tok "), (F.pmod(th, 12)).cast("int")),
    )
    # gap: 0s (duplicate-ts ties), seconds-scale, or >30min session breaks
    gap = (
        F.when(F.col("turn_idx") == 0, F.lit(0))
        .when(F.pmod(th, 11) == 0, F.lit(0))
        .when(F.pmod(th, 7) == 0, F.lit(2400) + F.pmod(th, 3600))
        .otherwise(5 + F.pmod(th, 55))
    )
    w = Window.partitionBy("conv_id").orderBy("turn_idx").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    base = F.to_timestamp(F.lit(EPOCH)) + F.make_interval(hours=F.pmod(F.col("_cid"), 240).cast("int"))
    ts = base + F.make_interval(secs=F.sum(gap).over(w).cast("double"))
    return turns.select(
        "conv_id",
        F.col("turn_idx").cast("int").alias("turn_idx"),
        role.alias("role"),
        text.alias("text"),
        tool.alias("tool"),
        ts.alias("ts"),
    )


_DOC_VOCAB = (
    "table scan filter join merge sort window agg group key value row column "
    "batch stream query plan spark data fast slow big small the a of order"
).split()


def documents_table(
    spark: SparkSession, n_docs: int = 1000, seed: int = 13, dup_every: int = 10
) -> DataFrame:
    """Deterministic synthetic document corpus for dedup benchmarks:
    (doc_id bigint, text string). Words drawn from a small vocab by
    xxhash64; every ``dup_every``-th doc is a NEAR-duplicate of its
    predecessor (same word stream, one word mutated) so minhash/simhash
    have real positives to find. Pure-expr generation — identical rows
    at any parallelism (scaling-run requirement)."""
    base = spark.range(n_docs).select(F.col("id").alias("doc_id"))
    is_dup = F.pmod(F.col("doc_id"), dup_every) == 1
    src = F.when(is_dup, F.col("doc_id") - 1).otherwise(F.col("doc_id"))
    h0 = F.abs(_h(src, F.lit(seed)))
    n_words = (20 + F.pmod(h0, F.lit(60))).cast("int")
    vocab = F.array(*[F.lit(w) for w in _DOC_VOCAB])

    def word(i):
        h = F.abs(_h(src, i, F.lit(seed)))
        # stem from a small vocab + numeric suffix -> effective vocab in
        # the thousands, so RANDOM doc pairs have near-zero jaccard (like
        # a real corpus) while planted dups stay near 1; without the
        # suffix every pair is ~10% similar and LSH candidate volume
        # explodes quadratically
        w = F.concat(
            F.element_at(vocab, (F.pmod(h, len(_DOC_VOCAB)) + 1).cast("int")),
            F.lit("_"), F.pmod(h, 211).cast("string"),
        )
        # dup docs mutate exactly one position -> jaccard just below 1
        return F.when(is_dup & (i == 3), F.lit("mutated")).otherwise(w)

    text = F.array_join(F.transform(F.sequence(F.lit(0), n_words - 1), word), " ")
    return base.select("doc_id", text.alias("text"))


def embeddings_table(
    spark: SparkSession, n_vecs: int = 1000, dim: int = 64,
    n_clusters: int = 64, seed: int = 5,
) -> DataFrame:
    """Deterministic clustered embedding corpus for ANN benchmarks:
    (vec_id bigint, embedding array<double>). Vectors are cluster center
    + small deterministic noise, both closed-form functions of
    (cluster, component) / (id, component) — generated in one Arrow
    batch pass (mapInPandas + numpy), identical at any parallelism
    because values depend only on vec_id."""
    import numpy as np
    import pandas as pd

    d, k, s = int(dim), int(n_clusters), int(seed)

    def gen(batches):
        j = np.arange(d, dtype=np.float64)
        for pdf in batches:
            ids = pdf["vec_id"].to_numpy(dtype=np.float64)
            c = (pdf["vec_id"].to_numpy(dtype=np.int64) % k).astype(np.float64)
            centers = np.sin(np.outer(c, j * 1.7) + c[:, None] * 37.1 + s) * 3.0
            noise = np.sin(np.outer(ids, j * 2.3) + ids[:, None] * 0.7919) * 0.4
            m = centers + noise
            yield pd.DataFrame({"vec_id": pdf["vec_id"], "embedding": list(m)})

    return (
        spark.range(n_vecs).select(F.col("id").alias("vec_id"))
        .mapInPandas(gen, schema="vec_id bigint, embedding array<double>")
    )


def annotations_table(
    spark: SparkSession, transcripts: DataFrame, every: int = 6, seed: int = 7
) -> DataFrame:
    """Sparse annotation table (FIXTURES.md F8): roughly one annotation per
    `every` turns, at a ts nudged off the turn grid (+/- a few seconds,
    some exactly equal for tie tests), with label/score payload."""
    th = F.abs(_h("conv_id", "turn_idx", F.lit(seed)))
    ann = transcripts.where(F.pmod(th, every) == 0).select(
        "conv_id",
        (F.col("ts") + F.make_interval(secs=(F.pmod(th, 9) - 4).cast("double"))).alias("ts"),
        F.concat(F.lit("label_"), F.pmod(th, 5).cast("string")).alias("label"),
        (F.pmod(th, 1000) / 1000.0).alias("score"),
    )
    return ann

"""Approximate-nearest-neighbor search over an embedding column.

- brute_force_topk: exact cosine top-k. The query set is broadcast
  (it is small by construction); the corpus streams through one codegen
  stage — no corpus shuffle at all except the final per-query top-k,
  which shuffles only (n_queries x k x fanout) candidate rows because
  a partial per-partition top-k runs map-side first.
- ivf_topk: IVF-style two-stage search — assign corpus vectors to the
  nearest of K deterministic centroids (a broadcast), then search only
  the query's nprobe closest centroid buckets. The scale path: bucket
  pruning turns a full scan into ~nprobe/K of the corpus.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def _dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: (x * y).cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def _norm(a: Column) -> Column:
    return F.sqrt(F.aggregate(a, F.lit(0.0), lambda acc, x: acc + (x * x).cast("double")))


def cosine(a: Column, b: Column) -> Column:
    return _dot(a, b) / (_norm(a) * _norm(b))


def brute_force_topk(
    corpus: DataFrame, queries: DataFrame, vec_col: str, id_col: str,
    k: int = 10, round_scores: int | None = 6,
) -> DataFrame:
    """Exact cosine top-k of `queries` (small, broadcast) against
    `corpus`. Returns (query_id, neighbor_id, score, rank); self-matches
    excluded; rank deterministic via (rounded score desc, neighbor asc)."""
    q = queries.select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("__qv")
    )
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("__cv")
    )
    score = cosine(F.col("__qv"), F.col("__cv"))
    if round_scores is not None:
        score = F.round(score, round_scores)
    scored = (
        c.join(F.broadcast(q), F.col("query_id") != F.col("neighbor_id"))
        .select("query_id", "neighbor_id", score.alias("score"))
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("score").desc(), F.col("neighbor_id").asc()
    )
    return (
        scored.select("*", F.row_number().over(w).alias("rank"))
        .where(F.col("rank") <= k)
    )


def ivf_topk(
    corpus: DataFrame, queries: DataFrame, vec_col: str, id_col: str,
    k: int = 10, n_centroids: int = 16, nprobe: int = 4,
) -> DataFrame:
    """IVF-bucketed ANN: centroids are the first `n_centroids` corpus
    vectors by id (deterministic; KMeans would drop in trivially and
    change nothing structurally). Corpus rows are assigned to their
    nearest centroid once; each query searches only its `nprobe`
    closest buckets."""
    cent = corpus.orderBy(F.col(id_col).asc()).limit(n_centroids).select(
        F.col(id_col).alias("cid"), F.col(vec_col).alias("cv")
    )
    cent_rows = cent.collect()  # n_centroids rows, tiny by construction
    cent_arr = F.array(*[F.lit([float(v) for v in r["cv"]]) for r in cent_rows])
    cent_ids = [int(r["cid"]) for r in cent_rows]

    def nearest_buckets(vec: Column, n: int) -> Column:
        """ids of the n closest centroids (by cosine) as an array."""
        sims = F.transform(cent_arr, lambda cv: cosine(vec, cv))
        idx = F.sequence(F.lit(0), F.lit(len(cent_ids) - 1))
        pairs = F.arrays_zip(sims.alias("s"), idx.alias("i"))
        ordered = F.reverse(F.array_sort(pairs))  # by sim asc -> reversed
        return F.transform(F.slice(ordered, 1, n), lambda p: p["i"])

    c = corpus.select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).alias("__cv"),
        F.element_at(nearest_buckets(F.col(vec_col), 1), 1).alias("bucket"),
    )
    q = queries.select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).alias("__qv"),
        F.explode(nearest_buckets(F.col(vec_col), nprobe)).alias("bucket"),
    )
    scored = (
        c.join(F.broadcast(q), ["bucket"])
        .where(F.col("query_id") != F.col("neighbor_id"))
        .select(
            "query_id", "neighbor_id",
            F.round(cosine(F.col("__qv"), F.col("__cv")), 6).alias("score"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("score").desc(), F.col("neighbor_id").asc()
    )
    return (
        scored.select("*", F.row_number().over(w).alias("rank"))
        .where(F.col("rank") <= k)
    )

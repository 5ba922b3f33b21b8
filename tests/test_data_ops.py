"""Training-data pipeline ops: text analysis, dedup, similarity,
multimodal plumbing — over the driver-provided documents/embeddings
testdata plus synthetic edge cases."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from kamae_spark.core.pipeline import PipelineModel
from kamae_spark.data.dedup import (
    SimHash,
    embedding_neardup_pairs,
    exact_dedup,
    minhash_lsh_pairs,
    ngram_jaccard_pairs,
    simhash_neardup_pairs,
)
from kamae_spark.data.multimodal import extract_features, frame_sample_plan, synthesize_assets
from kamae_spark.data.similarity import brute_force_topk, ivf_topk
from kamae_spark.data.text import Fingerprint, LanguageId, QualityScore, TokenCount

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def documents(spark):
    return spark.read.parquet(f"{SF}/documents.parquet").cache()


@pytest.fixture(scope="module")
def embeddings(spark):
    return spark.read.parquet(f"{SF}/embeddings.parquet").cache()


def test_text_analysis(documents):
    model = PipelineModel(
        [
            TokenCount(input_col="text", output_col="n_ws", mode="whitespace"),
            TokenCount(input_col="text", output_col="n_re", mode="regex"),
            QualityScore(input_col="text", output_col="quality"),
            LanguageId(input_col="text", output_col="lang_guess"),
            Fingerprint(input_col="text", output_col="fp"),
        ]
    )
    got = model.transform(documents).toPandas()
    # oracles computed in pandas
    exp_ws = got["text"].str.strip().str.split().map(len)
    assert got["n_ws"].tolist() == exp_ws.tolist()
    assert (got["n_re"] >= got["n_ws"]).all()  # regex splits punctuation out
    assert got["quality"].between(0, 1).all()
    assert got["fp"].str.len().eq(32).all()
    assert set(got["lang_guess"]) <= {"en", "es", "fr", "de", "und"}


def test_fingerprint_invariance(spark):
    df = spark.createDataFrame(
        [("Hello,  World!",), ("hello world",), ("HELLO ... WORLD",)], "text string"
    )
    got = PipelineModel([Fingerprint(input_col="text", output_col="fp")]).transform(df).toPandas()
    assert got["fp"].nunique() == 1  # case/punct/whitespace-invariant


def test_exact_dedup(spark):
    df = spark.createDataFrame(
        [(1, "same text"), (2, "Same  Text!"), (3, "different")], "id long, text string"
    )
    got = exact_dedup(df, "text", "id").toPandas().sort_values("keep_id")
    assert got["keep_id"].tolist() == [1, 3]
    assert got.set_index("keep_id")["n_dups"].loc[1] == 2


def test_ngram_jaccard_pairs(spark):
    df = spark.createDataFrame(
        [
            (1, "the quick brown fox jumps over the lazy dog"),
            (2, "the quick brown fox jumps over the lazy cat"),
            (3, "completely unrelated content here with words"),
        ],
        "id long, text string",
    )
    got = ngram_jaccard_pairs(df, "text", "id", threshold=0.5, length_bucket=None).toPandas()
    assert len(got) == 1
    assert (got["id_a"][0], got["id_b"][0]) == (1, 2)
    assert got["jaccard"][0] > 0.5


def test_minhash_lsh_recovers_near_dups(spark):
    base = "word%d " * 30
    rows = [(i, base % tuple(range(30))) for i in range(1, 4)]
    rows[1] = (2, rows[1][1].replace("word29", "CHANGED"))  # near-dup of 1
    rows[2] = (3, " ".join(f"other{j}" for j in range(30)))  # unrelated
    df = spark.createDataFrame(rows, "id long, text string")
    got = minhash_lsh_pairs(df, "text", "id", num_perm=64, bands=16, threshold=0.5).toPandas()
    pairs = set(zip(got["id_a"], got["id_b"]))
    assert (1, 2) in pairs
    assert (1, 3) not in pairs and (2, 3) not in pairs


def test_simhash_and_neardup(spark):
    toks_a = [f"tok{i}" for i in range(40)]
    toks_b = toks_a[:-1] + ["novel"]
    toks_c = [f"zzz{i}" for i in range(40)]
    df = spark.createDataFrame(
        [(1, toks_a), (2, toks_b), (3, toks_c)], "id long, toks array<string>"
    )
    sigs = PipelineModel([SimHash(input_col="toks", output_col="sig")]).transform(df)
    vals = {r["id"]: r["sig"] for r in sigs.collect()}
    assert vals[1] != 0 and len(set(vals.values())) == 3
    got = simhash_neardup_pairs(df, "toks", "id", max_hamming=8).toPandas()
    pairs = set(zip(got["id_a"], got["id_b"]))
    assert (1, 2) in pairs and (1, 3) not in pairs


def test_simhash_banding_pigeonhole(spark):
    """Every pair within max_hamming MUST be a candidate — including
    adversarial signatures whose differing bits span all bands of a
    COARSER banding (the round-1 recall bug: fixed 4 quarters at
    max_hamming>3). Also: too-few bands raises instead of dropping."""
    import random

    from kamae_spark.data.dedup import simhash_pairs_from_sigs

    rng = random.Random(7)
    rows, expected = [], set()
    base = rng.getrandbits(63)
    rows.append((0, base))
    nxt = 1
    for ham in (1, 3, 4, 7, 10):
        # spread the flipped bits maximally (worst case for banding)
        bits = [round(i * 63 / max(ham - 1, 1)) for i in range(ham)]
        sig = base
        for b in set(bits):
            sig ^= 1 << b
        rows.append((nxt, sig))
        expected.add((0, nxt, ham))
        nxt += 1
    rows.append((nxt, ~base & ((1 << 63) - 1)))  # far: ~63 differing bits
    df = spark.createDataFrame(
        [(i, s - (1 << 64) if s >= (1 << 63) else s) for i, s in rows],
        "id long, sig long",
    )
    got = simhash_pairs_from_sigs(df, "sig", "id", max_hamming=10).toPandas()
    found = {(a, b) for a, b in zip(got["id_a"], got["id_b"])}
    for a, b, ham in expected:
        assert (a, b) in found, f"missed pair at hamming={ham}"
    assert (0, nxt) not in found  # the far signature stays excluded

    with pytest.raises(ValueError):
        simhash_pairs_from_sigs(df, "sig", "id", max_hamming=10, bands=4)


def test_embedding_neardup(spark):
    rng = np.random.RandomState(0)
    v = rng.randn(8).astype(float)
    near = v + rng.randn(8) * 0.01
    far = rng.randn(8)
    df = spark.createDataFrame(
        [(1, v.tolist()), (2, near.tolist()), (3, far.tolist())],
        "id long, vec array<double>",
    )
    got = embedding_neardup_pairs(df, "vec", "id", threshold=0.98).toPandas()
    pairs = set(zip(got["id_a"], got["id_b"]))
    assert (1, 2) in pairs and (1, 3) not in pairs


def test_brute_force_topk_matches_numpy(embeddings):
    queries = embeddings.where(F.col("vec_id") < 3)
    got = brute_force_topk(embeddings, queries, "embedding", "vec_id", k=5).toPandas()
    pdf = embeddings.toPandas()
    mat = np.stack(pdf["embedding"].map(np.asarray))
    ids = pdf["vec_id"].to_numpy()
    norm = mat / np.linalg.norm(mat, axis=1, keepdims=True)
    for qid in range(3):
        qi = np.where(ids == qid)[0][0]
        sims = norm @ norm[qi]
        sims[qi] = -np.inf
        order = np.lexsort((ids, -np.round(sims, 6)))[:5]
        exp = ids[order].tolist()
        got_q = got[got["query_id"] == qid].sort_values("rank")["neighbor_id"].tolist()
        assert got_q == exp


def test_ivf_topk_recall(embeddings):
    queries = embeddings.where(F.col("vec_id") < 5)
    exact = brute_force_topk(embeddings, queries, "embedding", "vec_id", k=10).toPandas()
    approx = ivf_topk(embeddings, queries, "embedding", "vec_id", k=10,
                      n_centroids=8, nprobe=4).toPandas()
    recalls = []
    for qid in range(5):
        e = set(exact[exact["query_id"] == qid]["neighbor_id"])
        a = set(approx[approx["query_id"] == qid]["neighbor_id"])
        recalls.append(len(e & a) / len(e))
    assert np.mean(recalls) >= 0.5  # nprobe=4 of 8 buckets


def test_ivf_topk_recall_clustered(spark):
    """>=0.9 recall gate on a CLUSTERED corpus (the testdata embeddings
    are near-uniform random — intra-label cosine ~0.02 — where bucket
    pruning is information-free by construction; IVF's contract is about
    clustered corpora, so the quality gate uses one)."""
    from kamae_spark.data.similarity import brute_force_topk, ivf_topk

    rng = np.random.RandomState(3)
    centers = rng.randn(8, 32) * 3.0
    rows = []
    for i in range(400):
        c = i % 8
        rows.append((i, (centers[c] + rng.randn(32) * 0.4).tolist()))
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>").cache()
    q = df.where(F.col("vec_id") < 6)
    exact = brute_force_topk(df, q, "embedding", "vec_id", k=10).toPandas()
    approx = ivf_topk(df, q, "embedding", "vec_id", k=10,
                      n_centroids=8, nprobe=2).toPandas()
    recalls = []
    for qid in range(6):
        e = set(exact[exact["query_id"] == qid]["neighbor_id"])
        a = set(approx[approx["query_id"] == qid]["neighbor_id"])
        recalls.append(len(e & a) / len(e))
    assert np.mean(recalls) >= 0.9, recalls


def test_multimodal_plumbing(documents):
    assets = synthesize_assets(documents, "doc_id", "text")
    feats = extract_features(assets, dim=16)
    got = feats.toPandas()
    assert len(got) == documents.count()
    assert got["feature"].map(len).eq(16).all()
    norms = got["feature"].map(lambda f: float(np.linalg.norm(f)))
    assert (((norms - 1.0).abs() < 1e-5) | (norms == 0)).all()
    # deterministic across runs
    again = extract_features(assets, dim=16).toPandas().sort_values("asset_id")
    a = got.sort_values("asset_id")["feature"].map(tuple).tolist()
    assert a == again["feature"].map(tuple).tolist()


def test_multimodal_strict_raises(documents, spark):
    assets = synthesize_assets(documents.limit(3), "doc_id", "text")
    with pytest.raises(Exception, match="NotImplementedError|no codec|decoding"):
        extract_features(assets, strict=True).collect()


def test_frame_sample_plan(documents):
    assets = synthesize_assets(documents, "doc_id", "text")
    plan = frame_sample_plan(assets, every_ms=5000).toPandas()
    assert (plan["frame_ts_ms"] % 5000 == 0).all()
    vids = assets.where("kind = 'video'").count()
    assert plan["asset_id"].nunique() == vids

"""Multimodal columns: image/audio/video as opaque binary + typed metadata.

The Spark-side plumbing is REAL and tested — schema contract, Arrow
batch shape, mapInPandas partitioning; only the codec calls are stubbed
(image/audio libraries are not in this container). Each stub either
raises NotImplementedError (strict mode) or produces a deterministic
fake derived from the bytes (test mode), clearly marked.

Contract: a multimodal asset row is
  (asset_id bigint, kind string in {image,audio,video},
   payload binary, meta struct<...>)
Feature extraction is mapInPandas over Arrow batches: payloads never
pass through Python row-at-a-time, and batch size bounds executor
memory (spark.sql.execution.arrow.maxRecordsPerBatch).
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

ASSET_SCHEMA = T.StructType(
    [
        T.StructField("asset_id", T.LongType()),
        T.StructField("kind", T.StringType()),
        T.StructField("payload", T.BinaryType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("duration_ms", T.IntegerType()),
    ]
)

FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("asset_id", T.LongType()),
        T.StructField("kind", T.StringType()),
        T.StructField("n_bytes", T.IntegerType()),
        T.StructField("feature", T.ArrayType(T.FloatType())),
    ]
)


def synthesize_assets(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Deterministic fake binary assets from a text column (test data:
    no real media in-container). Payload = utf-8 bytes; kind cycles."""
    kind = F.element_at(
        F.array(F.lit("image"), F.lit("audio"), F.lit("video")),
        (F.pmod(F.col(id_col), 3) + 1).cast("int"),
    )
    return df.select(
        F.col(id_col).cast("long").alias("asset_id"),
        kind.alias("kind"),
        F.encode(F.col(text_col), "utf-8").alias("payload"),
        (F.pmod(F.col(id_col), 64) * 16 + 16).cast("int").alias("width"),
        (F.pmod(F.col(id_col), 48) * 16 + 16).cast("int").alias("height"),
        (F.pmod(F.col(id_col), 30000) + 1000).cast("int").alias("duration_ms"),
    )


def _decode_image(payload: bytes, width: int, height: int) -> np.ndarray:
    """STUB — real impl would be PIL/turbojpeg decode to HxWx3 uint8.
    Raises so accidental production use is loud."""
    raise NotImplementedError("image decoding requires PIL/libjpeg (not in container)")


def _fake_feature(payload: bytes, dim: int = 16) -> np.ndarray:
    """Deterministic stand-in feature: byte-value histogram folded to
    `dim` buckets, L2-normalized. Replaced by a real encoder in prod."""
    if payload is None or len(payload) == 0:
        return np.zeros(dim, dtype=np.float32)
    arr = np.frombuffer(payload, dtype=np.uint8)
    hist = np.bincount(arr % dim, minlength=dim).astype(np.float32)
    n = np.linalg.norm(hist)
    return hist / n if n > 0 else hist


def extract_features(assets: DataFrame, dim: int = 16, strict: bool = False) -> DataFrame:
    """mapInPandas feature extraction over Arrow batches.

    strict=True routes through the real (stubbed) decoders and raises;
    strict=False uses the deterministic fake so the pipeline shape is
    fully testable."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = []
            for payload, kind, w, h in zip(
                pdf["payload"], pdf["kind"], pdf["width"], pdf["height"]
            ):
                if strict:
                    if kind == "image":
                        _decode_image(payload, w, h)  # raises NotImplementedError
                    raise NotImplementedError(f"no codec for kind={kind}")
                feats.append(_fake_feature(payload, dim))
            yield pd.DataFrame(
                {
                    "asset_id": pdf["asset_id"],
                    "kind": pdf["kind"],
                    "n_bytes": pdf["payload"].map(lambda b: 0 if b is None else len(b)).astype("int32"),
                    "feature": [f.tolist() for f in feats],
                }
            )

    return assets.mapInPandas(run, schema=FEATURE_SCHEMA)


def frame_sample_plan(assets: DataFrame, every_ms: int = 1000) -> DataFrame:
    """Video frame-sampling PLAN: one row per (asset, frame_ts). The
    decode itself is stubbed; the explode/partitioning shape (the part
    that matters for cluster behavior) is real."""
    return (
        assets.where(F.col("kind") == "video")
        .select(
            "asset_id",
            F.explode(
                F.sequence(F.lit(0), (F.col("duration_ms") / every_ms).cast("int"))
            ).alias("frame_idx"),
            F.col("duration_ms"),
        )
        .select(
            "asset_id",
            "frame_idx",
            (F.col("frame_idx") * every_ms).alias("frame_ts_ms"),
        )
        .where(F.col("frame_ts_ms") <= F.col("duration_ms"))
    )

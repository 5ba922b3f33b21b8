"""Large-scale training-data pipeline operators: text analysis,
deduplication, similarity search, multimodal plumbing."""

from kamae_spark.data import dedup, multimodal, similarity, text  # noqa: F401

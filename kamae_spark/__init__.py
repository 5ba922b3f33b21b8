"""kamae_spark — a from-scratch, PySpark-native feature-engineering engine.

Kamae-style fit/transform estimator→transformer chains (reference:
ExpediaGroup/kamae, see SURVEY.md) re-expressed Spark-first:

- every row-wise operator is a pure Catalyst Column expression (zero
  per-row Python); unavoidable Python is Arrow-vectorized pandas UDFs
- windowed / point-in-time operators (lag/lead, rolling aggregates,
  sessionization, backfill, as-of join) are `pyspark.sql.Window` specs
  grouped so co-windowed stages share one shuffle
- pipelines compile the stage DAG into batched `select`s (CollapseProject
  friendly), with estimator-ancestor pruning at fit time
- sources/sinks are partitioned Parquet (Iceberg-shaped layout) with
  per-partition checkpoint / lineage / metrics tables for resumability
"""

from kamae_spark.core.stage import Estimator, Stage, Transformer, register, registry
from kamae_spark.core.pipeline import Pipeline, PipelineModel

__version__ = "0.1.0"

__all__ = [
    "Stage",
    "Transformer",
    "Estimator",
    "Pipeline",
    "PipelineModel",
    "register",
    "registry",
]

from kamae_spark.core.stage import Estimator, Stage, Transformer, register, registry
from kamae_spark.core.pipeline import Pipeline, PipelineModel

__all__ = ["Stage", "Transformer", "Estimator", "Pipeline", "PipelineModel", "register", "registry"]

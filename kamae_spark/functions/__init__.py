from kamae_spark.functions.arrays import elementwise, nested_transform, zipwise

__all__ = ["elementwise", "nested_transform", "zipwise"]

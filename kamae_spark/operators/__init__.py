# Operator package: importing submodules registers their stages.
from kamae_spark.operators import (  # noqa: F401
    arrays,
    conditional,
    datetimes,
    hashing,
    indexers,
    joins,
    math,
    pandas_fn,
    scalers,
    strings,
    windows,
)

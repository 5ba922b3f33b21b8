# Operator package: importing submodules registers their stages.
from kamae_spark.operators import (  # noqa: F401
    windows,
    joins,
)

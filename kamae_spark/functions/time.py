"""Timestamp helpers that work for TIMESTAMP and TIMESTAMP_NTZ columns.

Spark 4 forbids casting TIMESTAMP_NTZ directly to numeric; routing
through TIMESTAMP (interpreted in the session timezone — pin it to UTC
for determinism) makes epoch extraction type-agnostic."""

from __future__ import annotations

from pyspark.sql import Column


def epoch_seconds(col: Column) -> Column:
    """Whole epoch seconds (truncated) as bigint."""
    return col.cast("timestamp").cast("long")


def epoch_fractional(col: Column) -> Column:
    """Epoch seconds with fractional microseconds as double."""
    return col.cast("timestamp").cast("double")

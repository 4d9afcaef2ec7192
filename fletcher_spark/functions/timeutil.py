"""Timestamp helpers shared by queries and operators.

Parquet timestamps without UTC adjustment surface as TIMESTAMP_NTZ in
Spark 4; casting NTZ→long is illegal, so epoch extraction goes through
TimestampType first (session timezone is pinned to UTC by
``fletcher_spark.session``, making the conversion deterministic and
DuckDB-compatible: ``epoch(ts)::BIGINT``).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def epoch_seconds(col: Column | str) -> Column:
    """Epoch seconds as LongType for TIMESTAMP or TIMESTAMP_NTZ input."""
    c = F.col(col) if isinstance(col, str) else col
    return c.cast("timestamp").cast("long")


def ts_lit(s: str) -> Column:
    """A timestamp literal comparable against either timestamp flavor."""
    return F.lit(s).cast("timestamp")

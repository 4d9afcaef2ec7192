"""Skew mitigation: salted two-phase aggregation.

AQE's skew-join splitting (enabled in session.py) covers joins; hot
KEYS in aggregations still funnel one key's rows into one task.  The
standard fix is salting: phase 1 aggregates on (key, salt) — spreading
a hot key over ``n_salts`` tasks — and phase 2 merges the partials on
the bare key.  Sum/count/min/max merge trivially; distinct-style
aggregates merge via set union.

For algebraic aggregates over *uniform* keys this is pure overhead
(map-side partial aggregation already combines) — use it when a key's
row share is large enough that one task dominates the stage.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def salted(df: DataFrame, n_salts: int = 16, salt_col: str = "__salt") -> DataFrame:
    """Attach a uniform salt in [0, n_salts) — deterministic per row is
    unnecessary (any spread works), but rand-free: hash of all columns
    keeps re-runs stable."""
    return df.withColumn(salt_col, F.pmod(F.hash(*df.columns), F.lit(n_salts)))


def salted_count(df: DataFrame, key: str, n_salts: int = 16) -> DataFrame:
    """COUNT(*) per key with a salted pre-aggregation: phase 1 counts
    (key, salt) groups, phase 2 sums the ≤ n_salts partials per key."""
    phase1 = (
        salted(df, n_salts)
        .groupBy(key, "__salt")
        .agg(F.count(F.lit(1)).alias("__n"))
    )
    return phase1.groupBy(key).agg(F.sum("__n").alias("n"))


def salted_distinct_count(df: DataFrame, key: str, val: str, n_salts: int = 16) -> DataFrame:
    """COUNT(DISTINCT val) per key: phase 1 collects per-(key, salt)
    distinct sets, phase 2 unions them — the set union is over ≤
    n_salts already-deduped partials, so the hot key's rows never meet
    in one task."""
    phase1 = (
        salted(df, n_salts)
        .groupBy(key, "__salt")
        .agg(F.collect_set(val).alias("__vals"))
    )
    merged = phase1.groupBy(key).agg(
        F.array_distinct(F.flatten(F.collect_list("__vals"))).alias("__all")
    )
    return merged.select(key, F.size("__all").alias("n_distinct"))

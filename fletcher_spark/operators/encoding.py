"""Set-like / encoding / dedup primitives (SURVEY.md §2.3).

* ``unique``        — /root/reference/fletcher/base.py:652-666 (C++ hash via
  ``pa.ChunkedArray.unique``).  Spark: ``distinct`` (hash agg).
* ``value_counts``  — /root/reference/fletcher/base.py:863-890.  Spark:
  ``groupBy().count()``.
* ``factorize``     — /root/reference/fletcher/base.py:1116-1130,1528-1549
  (``pa.dictionary_encode``; NA → sentinel -1).  Distributed dense code
  assignment below — NEVER a global ``Window.orderBy`` over the full
  table (single-partition trap, SURVEY.md §7 risk register).
* ``concat``        — /root/reference/fletcher/base.py:930-943 (copying) /
  1309-1326 (zero-copy chunked).  Spark: ``unionByName`` — partition-set
  union, the zero-copy analog.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def unique(df: DataFrame, col: str) -> DataFrame:
    """Distinct values — map-side partial dedup, then one shuffle."""
    return df.select(col).distinct()


def value_counts(df: DataFrame, col: str, dropna: bool = True) -> DataFrame:
    """Count per distinct value; ``count`` column like pandas."""
    base = df.filter(F.col(col).isNotNull()) if dropna else df
    return base.groupBy(col).agg(F.count(F.lit(1)).alias("count"))


def factorize(df: DataFrame, col: str, code_col: str = "code") -> DataFrame:
    """Dense integer codes (0..n_uniques-1) for a column, NA → -1.

    Plan: distinct (shuffle #1, sized by cardinality not row count) →
    sort the *distinct set only* and assign ids with zipWithIndex (a
    per-partition count + offset pass — no single-partition window) →
    broadcast-or-shuffle join codes back (shuffle #2 only when the
    dictionary is too big to broadcast).

    Codes are deterministic: sorted order of the distinct values, which
    also matches the dense_rank()-1 SQL spec.
    """
    spark = df.sparkSession
    distinct = df.select(col).filter(F.col(col).isNotNull()).distinct().orderBy(col)
    # zipWithIndex: one extra job to count per-partition sizes, then a
    # cheap mapPartitions — the standard scalable dense-id assignment.
    schema = distinct.schema.add(code_col, "long")
    codes = spark.createDataFrame(
        distinct.rdd.zipWithIndex().map(lambda t: (*t[0], t[1])), schema
    )
    out = df.join(F.broadcast(codes), on=col, how="left")
    return out.withColumn(code_col, F.coalesce(F.col(code_col), F.lit(-1)))


def concat(dfs: list[DataFrame]) -> DataFrame:
    """UNION ALL of same-typed frames (``_concat_same_type`` analog)."""
    out = dfs[0]
    for d in dfs[1:]:
        out = out.unionByName(d)
    return out

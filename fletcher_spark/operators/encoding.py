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


#: Dictionaries at or below this cardinality are broadcast back to the
#: fact side; larger ones fall back to a shuffle join (and a
#: range-partitioned id assignment so no single task holds the dict).
BROADCAST_DICT_MAX = 2_000_000


def factorize(df: DataFrame, col: str, code_col: str = "code") -> DataFrame:
    """Dense integer codes (0..n_uniques-1) for a column, NA → -1.

    Plan: distinct (shuffle #1, sized by *cardinality*, not row count) →
    assign sorted dense ids — entirely JVM-side, never through a Python
    RDD hop — → join codes back onto the fact table.

    Two id-assignment paths, picked by dictionary cardinality:

    * small (≤ ``BROADCAST_DICT_MAX``): ``row_number() OVER (ORDER BY
      col)`` on the distinct set only.  The "global window" touches just
      the dictionary (which is about to be broadcast anyway, so it fits
      on one task by assumption), and the join back is a broadcast-hash
      join — the fact side never shuffles.
    * large: ``repartitionByRange`` the distinct set on ``col`` (range
      partition i holds values strictly below partition i+1), rank
      within each range partition, then add per-partition offsets
      computed from partition counts (a tiny aggregate, collected —
      one row per partition).  Join back is a shuffle hash join.

    Codes are deterministic either way: sorted order of the distinct
    values == the ``dense_rank()-1`` SQL spec.
    """
    from pyspark.sql import Window

    distinct = df.select(col).filter(F.col(col).isNotNull()).distinct()
    n_uniques = distinct.count()

    if n_uniques <= BROADCAST_DICT_MAX:
        w = Window.orderBy(col)
        codes = distinct.withColumn(code_col, F.row_number().over(w).cast("long") - 1)
        out = df.join(F.broadcast(codes), on=col, how="left")
    else:
        spark = df.sparkSession
        n_parts = int(spark.conf.get("spark.sql.shuffle.partitions", "200"))
        ranged = distinct.repartitionByRange(n_parts, F.col(col)).withColumn(
            "__pid", F.spark_partition_id()
        )
        w_local = Window.partitionBy("__pid").orderBy(col)
        ranked = ranged.withColumn("__rk", F.row_number().over(w_local).cast("long"))
        # One row per range partition — safe to collect, then broadcast.
        counts = ranked.groupBy("__pid").agg(F.count(F.lit(1)).alias("__n")).collect()
        offsets, acc = {}, 0
        for r in sorted(counts, key=lambda r: r["__pid"]):
            offsets[r["__pid"]] = acc
            acc += r["__n"]
        off_df = spark.createDataFrame(
            [(pid, off) for pid, off in offsets.items()], ["__pid", "__off"]
        )
        codes = (
            ranked.join(F.broadcast(off_df), "__pid")
            .withColumn(code_col, F.col("__off") + F.col("__rk") - 1)
            .select(col, code_col)
        )
        out = df.join(codes, on=col, how="left")
    return out.withColumn(code_col, F.coalesce(F.col(code_col), F.lit(-1)))


def concat(dfs: list[DataFrame]) -> DataFrame:
    """UNION ALL of same-typed frames (``_concat_same_type`` analog)."""
    out = dfs[0]
    for d in dfs[1:]:
        out = out.unionByName(d)
    return out

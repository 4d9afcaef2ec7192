"""Selection / null-handling / cast primitives (SURVEY.md §2.2).

Reference parity, re-expressed for a partitioned engine:

* ``isna``            — /root/reference/fletcher/base.py:892-902 (bitmap→bytemap
  kernel).  Spark: ``Column.isNull`` (validity handled by Tungsten).
* ``fillna`` (value)  — /root/reference/fletcher/base.py:1155-1213.  Spark:
  ``coalesce``.
* ``fillna`` (pad/backfill) — /root/reference/fletcher/base.py:1196-1210
  (object-dtype pandas fallback).  Spark: ``last/first(ignorenulls)``
  over an ordered window — REQUIRES explicit ordering + partition keys,
  because "previous row" is undefined in a distributed table.
* ``take``            — /root/reference/fletcher/base.py:690-792.  Positional
  gather has no stable meaning on an unordered distributed table; the
  capability is keyed gather: broadcast the (small) key list and join.
* ``astype``          — /root/reference/fletcher/base.py:794-861.  Spark
  ``cast``; note Spark truncates double→int while DuckDB rounds.
* ``flatten``         — /root/reference/fletcher/base.py:1272-1276.  Spark
  ``explode`` (row-multiplying) / ``flatten`` (list-of-list collapse).
* setitem             — /root/reference/fletcher/base.py:945-1018.  Immutable
  here: ``when(cond, value).otherwise(col)``.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def is_null(col: Column | str) -> Column:
    return (F.col(col) if isinstance(col, str) else col).isNull()


def fill_null(col: Column | str, value) -> Column:
    """fillna with a scalar — null-aware coalesce (JVM expression)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.coalesce(c, F.lit(value))


def ffill(
    df: DataFrame, col: str, order: Sequence[str], partition: Sequence[str],
    out: str | None = None,
) -> DataFrame:
    """Forward-fill: propagate the last non-null value in ``order`` within
    ``partition``.  One shuffle on the partition keys; never a global sort."""
    w = (
        Window.partitionBy(*partition)
        .orderBy(*[F.asc(c) for c in order])
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return df.withColumn(out or col, F.last(col, ignorenulls=True).over(w))


def bfill(
    df: DataFrame, col: str, order: Sequence[str], partition: Sequence[str],
    out: str | None = None,
) -> DataFrame:
    """Backward-fill: next valid observation (mirror of ``ffill``)."""
    w = (
        Window.partitionBy(*partition)
        .orderBy(*[F.asc(c) for c in order])
        .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    )
    return df.withColumn(out or col, F.first(col, ignorenulls=True).over(w))


def set_where(df: DataFrame, col: str, cond: Column, value) -> DataFrame:
    """Immutable ``__setitem__``: rewrite ``col`` where ``cond`` holds."""
    return df.withColumn(col, F.when(cond, F.lit(value)).otherwise(F.col(col)))


#: key lists at or below this size go through a literal IN predicate,
#: which Catalyst pushes into the parquet scan (PushedFilters: In(...))
#: — the scan prunes row groups instead of reading the whole table.
ISIN_PUSHDOWN_MAX = 1000


def take_by_key(df: DataFrame, key: str, keys: Sequence) -> DataFrame:
    """Keyed gather — the distributed replacement for positional ``take``.

    Small key lists become a literal ``isin`` filter so the predicate
    reaches the parquet reader (row-group pruning via min/max stats —
    at 100× scale the difference between scanning 6 keys and scanning
    the table).  Larger lists fall back to a broadcast semi-join, which
    still never shuffles the big side but cannot prune the scan.
    """
    if len(keys) <= ISIN_PUSHDOWN_MAX:
        return df.filter(F.col(key).isin(list(keys)))
    spark = df.sparkSession
    keys_df = spark.createDataFrame([(k,) for k in keys], [key])
    return df.join(F.broadcast(keys_df), key, "left_semi")


def slice_rows(df: DataFrame, order: Sequence[Column], start: int, stop: int) -> DataFrame:
    """Deterministic slice [start, stop) under an explicit ordering.

    Spark 4's native ``offset`` + ``limit`` compile to a global
    TakeOrderedAndProject-style plan; fine for page-sized slices, wrong
    tool for "skip 10 TB" (use keyed predicates for that).
    """
    return df.orderBy(*order).offset(start).limit(stop - start)


def explode_list(df: DataFrame, col: str, out: str = "val", keep: Sequence[str] = ()) -> DataFrame:
    """``flatten()`` analog for ``list<T>`` columns — row-multiplying."""
    return df.select(*keep, F.explode(F.col(col)).alias(out))


def flatten_nested(col: Column | str) -> Column:
    """``list<list<T>>`` → ``list<T>`` without changing row count."""
    return F.flatten(F.col(col) if isinstance(col, str) else col)

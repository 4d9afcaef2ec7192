"""Reductions (SURVEY.md §2.4) — the reference's ``_reduce`` map
(/root/reference/fletcher/base.py:470-523) re-expressed as Spark
aggregate expressions.

The reference's chunked reduction (``np_reduce_op``,
/root/reference/fletcher/_algorithms.py:142-152) is literally
partial-per-chunk + final re-reduce; Spark's HashAggregate generalizes
that across executors (partial before the exchange, final after), so
every function here is a plain expression — no custom code path.

Null semantics: SQL (skip nulls; all-null group → NULL).  The reference
additionally supports pandas' ``skipna=False`` (any null → NA), exposed
here as ``skipna=False`` → wrap in a null-poisoning guard.  NOTE the
reference's mean divides by the *total* length including nulls
(/root/reference/fletcher/base.py:504-505) — a documented bug we do NOT
reproduce; ``avg`` uses SQL semantics.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def _null_poison(c: Column, agg: Column) -> Column:
    """pandas skipna=False: result is NULL if any input value is null."""
    any_null = F.max(c.isNull().cast("int")) == 1
    return F.when(any_null, F.lit(None)).otherwise(agg)


def _wrap(c: Column | str, fn, skipna: bool = True) -> Column:
    col = F.col(c) if isinstance(c, str) else c
    agg = fn(col)
    return agg if skipna else _null_poison(col, agg)


def sum_(c, skipna=True):       return _wrap(c, F.sum, skipna)
def min_(c, skipna=True):       return _wrap(c, F.min, skipna)
def max_(c, skipna=True):       return _wrap(c, F.max, skipna)
def prod(c, skipna=True):       return _wrap(c, F.product, skipna)
def mean(c, skipna=True):       return _wrap(c, F.avg, skipna)
def std(c, ddof: int = 1, skipna=True):
    return _wrap(c, F.stddev_samp if ddof == 1 else F.stddev_pop, skipna)
def var(c, ddof: int = 1, skipna=True):
    return _wrap(c, F.var_samp if ddof == 1 else F.var_pop, skipna)
def skew(c, skipna=True):       return _wrap(c, F.skewness, skipna)
def kurt(c, skipna=True):       return _wrap(c, F.kurtosis, skipna)
def median(c, skipna=True):     return _wrap(c, F.median, skipna)


def median_approx(c, accuracy: int = 10000) -> Column:
    """The unbounded-cardinality 100 TB path: exact median needs a full
    sort of the group; percentile_approx is a fixed-memory sketch
    (error 1/accuracy).  For columns whose DISTINCT cardinality is
    tractable (quantities, lengths, prices), :func:`exact_quantiles`
    is exact AND distributed."""
    col = F.col(c) if isinstance(c, str) else c
    return F.percentile_approx(col, 0.5, accuracy)


def exact_quantiles(df, val_col: str, probs: dict, group_cols: tuple = ()):
    """Exact interpolated quantiles (``quantile_cont`` semantics) from a
    VALUE HISTOGRAM — distributed-exact, unlike Spark's
    ``percentile()``/``median()`` whose final merge task buffers every
    value of the group.

    Plan: groupBy(group, value) count (shuffle sized by group×distinct
    cardinality, map-side combined) → per-group cumulative rank (keyed
    window — distributed across groups) → quantile p interpolates
    between the values at cumulative ranks ``floor/ceil(1 + (n−1)p)``.
    Exact for any column with tractable distinct cardinality; for
    unbounded-cardinality doubles use :func:`median_approx`.

    ``probs`` maps output column name → probability.  Returns one row
    per group: (group..., <name> double ...).
    """
    from pyspark.sql import Window

    hist = (
        df.filter(F.col(val_col).isNotNull())  # quantile_cont skips nulls
        .groupBy(*group_cols, F.col(val_col).alias("v"))
        .agg(F.count(F.lit(1)).alias("c"))
    )
    wcum = Window.partitionBy(*(group_cols or [F.lit(1)])).orderBy("v").rowsBetween(
        Window.unboundedPreceding, 0
    )
    wall = Window.partitionBy(*(group_cols or [F.lit(1)]))
    cum = hist.select(
        *group_cols,
        "v",
        F.sum("c").over(wcum).alias("cum"),
        F.sum("c").over(wall).alias("nn"),
    )
    aggs, outs = [], []
    for name, p in probs.items():
        pos = 1 + (F.col("nn") - 1) * F.lit(float(p))
        aggs += [
            F.min(F.when(F.col("cum") >= F.floor(pos), F.col("v"))).alias(f"_lo_{name}"),
            F.min(F.when(F.col("cum") >= F.ceil(pos), F.col("v"))).alias(f"_hi_{name}"),
            F.min(pos - F.floor(pos)).alias(f"_fr_{name}"),
        ]
        outs.append(
            (
                F.col(f"_lo_{name}")
                + F.col(f"_fr_{name}") * (F.col(f"_hi_{name}") - F.col(f"_lo_{name}"))
            )
            .cast("double")
            .alias(name)
        )
    agg = cum.groupBy(*group_cols).agg(*aggs) if group_cols else cum.agg(*aggs)
    return agg.select(*group_cols, *outs)


def any_(c, skipna=True):
    """Boolean ANY (reference: bit-level short-circuit scan,
    /root/reference/fletcher/algorithms/bool.py:15-64).  SQL bool_or
    ignores nulls = pandas skipna=True; Kleene variant via skipna=False:
    TRUE if any true, else NULL if any null, else FALSE."""
    col = F.col(c) if isinstance(c, str) else c
    agg = F.bool_or(col)
    if skipna:
        return F.coalesce(agg, F.lit(False))
    return F.when(agg, F.lit(True)).otherwise(
        F.when(F.max(col.isNull().cast("int")) == 1, F.lit(None)).otherwise(F.lit(False))
    )


def all_(c, skipna=True):
    """Boolean ALL (/root/reference/fletcher/algorithms/bool.py:67-101).
    skipna=True follows pandas ("True unless a valid False")."""
    col = F.col(c) if isinstance(c, str) else c
    agg = F.bool_and(col)
    if skipna:
        return F.coalesce(agg, F.lit(True))
    return F.when(~agg, F.lit(False)).otherwise(
        F.when(F.max(col.isNull().cast("int")) == 1, F.lit(None)).otherwise(F.lit(True))
    )


#: name → callable, mirroring the reference's `_reduce(name)` dispatch.
REDUCTIONS = {
    "sum": sum_, "min": min_, "max": max_, "prod": prod, "mean": mean,
    "std": std, "var": var, "skew": skew, "kurt": kurt, "median": median,
    "any": any_, "all": all_,
}

"""One-pass dataset profiling — the ANALYZE-style statistics a 100 TB
pipeline consults before choosing a plan (broadcast or shuffle? salt
this key? is this column dead?).

Everything here is a SINGLE aggregate job over one scan:

* :func:`profile` — per-column stats (rows, nulls, approx distinct,
  min/max, mean for numerics, length stats for strings) computed as one
  wide ``agg`` — never one job per column, which at 100 TB would scan
  the corpus |columns| times.
* :func:`key_skew_report` — heavy-hitter shares for a prospective
  join/group key: one hash aggregate + a top-k (TakeOrdered), the
  number that tells you whether AQE's skew split or an explicit salt
  (operators/skew.py) is needed.

Distinct counts are HyperLogLog (``approx_count_distinct``) by design:
fixed-size sketches merge across partitions, where exact distinct would
shuffle the full column.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

__all__ = ["profile", "key_skew_report"]

_NUMERIC = (
    T.ByteType, T.ShortType, T.IntegerType, T.LongType,
    T.FloatType, T.DoubleType, T.DecimalType,
)


def profile(
    df: DataFrame,
    columns: list[str] | None = None,
    rsd: float = 0.05,
    distinct: str = "approx",
) -> DataFrame:
    """Per-column statistics in ONE aggregate over ONE scan.

    Returns a long-form DataFrame ``(column, dtype, n_rows, n_nulls,
    approx_distinct, min, max, mean)`` — min/max/mean as strings so
    heterogeneous column types fit one schema (this is a report, not an
    input to further arithmetic).  ``rsd`` is the HyperLogLog relative
    standard deviation; ``distinct="exact"`` swaps in exact
    count_distinct (per-column shuffle of distinct values — the
    oracle-parity mode; ``"approx"`` is the 100 TB default: fixed-size
    sketches that merge across partitions).
    """
    fields = {f.name: f.dataType for f in df.schema.fields}
    cols = list(columns) if columns is not None else list(fields)

    # SQL-text identifier/literal escaping (ADVICE r13): the parsed-text
    # form must handle ANY column name, as the Column-API form it
    # replaced did — backticks double inside quoted identifiers, quotes
    # escape inside string literals.
    def _ident(name: str) -> str:
        return "`{}`".format(name.replace("`", "``"))

    def _slit(s: str) -> str:
        return "'{}'".format(s.replace("\\", "\\\\").replace("'", "\\'"))

    # every aggregate and the one-row stack built as parsed SQL text
    # (r13 wave 10, guide §7.3): the per-node Column form cost ~0.6 s
    # of py4j round-trips per construction at ~8 columns × 4 aggs;
    # trees identical (CASE WHEN c IS NULL THEN 1 END is F.when with
    # no otherwise, the D-suffixed rsd stays double-typed)
    aggs = ["count(1) AS __n"]
    for c in cols:
        dt = fields[c]
        q = _ident(c)
        aggs.append(f"count(CASE WHEN {q} IS NULL THEN 1 END) AS {_ident(c + '__nulls')}")
        if distinct == "exact":
            aggs.append(f"count(DISTINCT {q}) AS {_ident(c + '__dist')}")
        else:
            aggs.append(
                f"approx_count_distinct({q}, {float(rsd)!r}D) AS {_ident(c + '__dist')}"
            )
        if isinstance(dt, _NUMERIC):
            probe = q
        elif isinstance(dt, (T.StringType, T.BinaryType)):
            probe = f"length({q})"
        else:
            probe = None
        if probe is None:
            for stat in ("min", "max", "mean"):
                aggs.append(f"CAST(NULL AS STRING) AS {_ident(f'{c}__{stat}')}")
        else:
            aggs.append(f"CAST(min({probe}) AS STRING) AS {_ident(c + '__min')}")
            aggs.append(f"CAST(max({probe}) AS STRING) AS {_ident(c + '__max')}")
            aggs.append(f"CAST(avg({probe}) AS STRING) AS {_ident(c + '__mean')}")
    wide = df.agg(*[F.expr(a) for a in aggs])

    # pivot the single wide row to long form with a literal stack — the
    # reshape runs on ONE row, not on the data
    parts = ",".join(
        "named_struct("
        f"'column', {_slit(c)}, "
        f"'dtype', {_slit(fields[c].simpleString())}, "
        "'n_rows', __n, "
        f"'n_nulls', {_ident(c + '__nulls')}, "
        f"'approx_distinct', {_ident(c + '__dist')}, "
        f"'min', {_ident(c + '__min')}, "
        f"'max', {_ident(c + '__max')}, "
        f"'mean', {_ident(c + '__mean')})"
        for c in cols
    )
    return wide.selectExpr(f"explode(array({parts})) AS s").select("s.*")


def key_skew_report(df: DataFrame, key: str, top: int = 10) -> DataFrame:
    """Heavy-hitter report for a join/group key: the ``top`` most
    frequent key values with their share of all rows.

    One key-hashed aggregate (map-side combined) + a corpus-size 1-row
    aggregate joined in as a broadcast + TakeOrdered top-k.  Rule of
    thumb this feeds: a key whose top bucket exceeds a few times the
    average partition size needs AQE skew-join or a salt
    (operators/skew.py) before it becomes a straggler task."""
    total = df.agg(F.count(F.lit(1)).alias("__total"))
    return (
        df.groupBy(F.col(key).alias("key_value"))
        .agg(F.count(F.lit(1)).alias("n_rows"))
        .crossJoin(F.broadcast(total))
        .select(
            "key_value",
            "n_rows",
            F.round(F.col("n_rows") / F.col("__total"), 6).alias("share"),
        )
        .orderBy(F.desc("n_rows"), "key_value")
        .limit(top)
    )

"""UDF harness (SURVEY.md §2.7): vectorized Python escape hatches.

Reference: ``apply_binary_str`` (fletcher/algorithms/string.py:1046-1119)
lets a user run a JIT-compiled ``f(bytes_a, len_a, bytes_b, len_b) →
scalar`` over two string columns with automatic null merging and chunk
realignment.  The exact Spark analog is a ``pandas_udf``: Arrow moves
whole column batches (the reference's "chunk") across the JVM↔Python
boundary, the user function sees ``pd.Series``, and Spark handles
distribution; null merging is done here so user kernels never see NaN.

These are the **slow path** by design — everything in
``operators/strings.py`` stays JVM-side.  Use this tier only for
semantics the JVM cannot express (``textwrap.wrap``,
``unicodedata.normalize``, true Unicode ``casefold``/``swapcase``).
"""

from __future__ import annotations

from collections.abc import Callable

import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf


def apply_binary_str(
    func: Callable[[str, str], object],
    output_type: str = "long",
) -> Callable[[Column, Column], Column]:
    """Wrap a per-row ``f(a: str, b: str) → scalar`` into an
    Arrow-vectorized binary string UDF with null merging.

    Mirror of fletcher's ``apply_binary_str`` contract
    (fletcher/algorithms/string.py:1046-1119): rows where either input
    is null yield null without calling ``func`` (the reference's
    ``_apply_with_nulls`` kernels, string.py:930-1000).

    The returned callable is a normal Column function:
    ``plen = apply_binary_str(lambda a, b: len(commonprefix((a, b))))``
    then ``df.select(plen(F.col("x"), F.col("y")))``.
    """

    @pandas_udf(output_type)
    def _udf(a: pd.Series, b: pd.Series) -> pd.Series:
        # positional build (not mask assignment): stays correct for
        # ragged outputs like array<string>
        return pd.Series(
            [
                None if x is None or y is None else func(x, y)
                for x, y in zip(a.astype("object").where(a.notna(), None),
                                b.astype("object").where(b.notna(), None))
            ],
            dtype="object",
        )

    return _udf


def apply_unary_str(
    func: Callable[[str], object],
    output_type: str = "string",
) -> Callable[[Column], Column]:
    """Unary variant for Python-only string semantics (wrap, normalize,
    casefold); same null contract as :func:`apply_binary_str`."""

    @pandas_udf(output_type)
    def _udf(a: pd.Series) -> pd.Series:
        return pd.Series(
            [None if x is None else func(x) for x in a.astype("object").where(a.notna(), None)],
            dtype="object",
        )

    return _udf


# --------------------------------------------------------------------------
# Reference demo kernels
# --------------------------------------------------------------------------


def prefix_length(a: Column, b: Column) -> Column:
    """Length of the common prefix of two string columns.

    The reference's canonical ``apply_binary_str`` example UDF
    (/root/reference/tests/test_text.py — ``prefix_length``): a numba
    kernel comparing raw bytes; here a per-row Python loop inside an
    Arrow batch.  Codepoint-based (Python ``str``), not byte-based.
    """

    def _prefix(x: str, y: str) -> int:
        n = min(len(x), len(y))
        i = 0
        while i < n and x[i] == y[i]:
            i += 1
        return i

    return apply_binary_str(_prefix, "long")(a, b)


def wrap(col: Column, width: int) -> Column:
    """``textwrap.wrap`` — pure-Python semantics (greedy word wrap with
    Python's whitespace rules); returns array<string> of lines."""
    import textwrap

    wrapper = textwrap.TextWrapper(width=width)
    return apply_unary_str(wrapper.wrap, "array<string>")(col)


def normalize(col: Column, form: str = "NFC") -> Column:
    """``unicodedata.normalize`` — no JVM builtin matches Python's
    normalization tables exactly, so this stays Python-side."""
    import unicodedata

    return apply_unary_str(lambda s: unicodedata.normalize(form, s), "string")(col)


def casefold(col: Column) -> Column:
    """True Unicode casefold (ß→ss) — Python semantics."""
    return apply_unary_str(str.casefold, "string")(col)


def swapcase(col: Column) -> Column:
    """Full-Unicode swapcase; the JVM tier (operators/strings.py) is
    ASCII-only via translate."""
    return apply_unary_str(str.swapcase, "string")(col)


# --------------------------------------------------------------------------
# UDAF / UDTF surface (SURVEY.md §2.7 host-provided row)
# --------------------------------------------------------------------------


def grouped_agg(func: Callable[[pd.Series], object], output_type: str = "double"):
    """Arrow-vectorized user aggregate (pandas_udf GROUPED_AGG): the
    whole group's column arrives as one pd.Series per partition-group.

    The reference has no UDAF surface (SURVEY.md §2.7 host row) — Spark
    supplies partial aggregation + shuffle; the Python function only
    sees final per-group batches.
    """
    return pandas_udf(func, output_type, "grouped_agg")  # type: ignore[call-overload]


def geometric_mean(col: Column) -> Column:
    """Demo UDAF: per-group geometric mean (SQL-checkable as
    exp(avg(ln(x))), which the oracle uses)."""
    import numpy as np

    @pandas_udf("double")
    def _geomean(v: pd.Series) -> float:
        v = v.dropna()
        if len(v) == 0:
            return None
        return float(np.exp(np.log(v.astype("float64")).mean()))

    # pandas_udf with a scalar return type infers GROUPED_AGG from the
    # function signature (Series -> scalar)
    return _geomean(col)


def make_split_words_udtf(spark):
    """Demo Python UDTF (Spark 4): one output row per whitespace token
    with its index — the table-function shape (posexplode equivalent,
    used where per-row fan-out needs imperative Python).  Registered as
    ``split_words`` for SQL use; tests/test_udf.py pins behavior."""
    from pyspark.sql.functions import udtf

    @udtf(returnType="idx: int, word: string")
    class SplitWords:
        def eval(self, text: str):
            if text is None:
                return
            for i, w in enumerate(text.split()):
                yield i, w

    spark.udtf.register("split_words", SplitWords)
    return SplitWords


def grouped_map_zscore(df, group_col: str, value_col: str):
    """Grouped-map ``applyInPandas``: each group arrives as ONE pandas
    DataFrame (Arrow batches, cogrouped by the shuffle), the kernel
    returns a transformed frame — the §2.7 shape for per-group logic
    that needs the whole group materialized (sklearn-style fit per
    group, resampling, ...).

    Used sparingly at scale: a group must fit in one executor's memory
    (unlike GROUPED_AGG, which streams), so key cardinality and skew
    decide viability — salt or pre-aggregate when a group can exceed
    ~100 MB.  Demonstrated with z-score normalization, whose oracle is
    pure SQL (value - avg) / stddev_samp OVER (PARTITION BY group).
    """
    out_schema = f"{group_col} string, {value_col} double, z double"

    def _z(pdf: pd.DataFrame) -> pd.DataFrame:
        mu = pdf[value_col].mean()
        sd = pdf[value_col].std(ddof=1)
        return pd.DataFrame(
            {
                group_col: pdf[group_col],
                value_col: pdf[value_col],
                "z": (pdf[value_col] - mu) / sd,
            }
        )

    return df.select(group_col, value_col).groupBy(group_col).applyInPandas(_z, out_schema)


def arrow_map_utf8_stats(df, id_col: str = "doc_id", text_col: str = "text"):
    """``mapInArrow``: the zero-copy tier below pandas_udf — batches
    arrive as ``pyarrow.RecordBatch`` and the kernel runs
    ``pyarrow.compute`` (C++) over the raw Arrow buffers, with no
    pandas materialization.  This is the closest Spark analog to the
    reference's buffer-level kernels (fletcher/algorithms/string.py
    operates on the same three Arrow buffers pc does), so it is the
    right tier for custom Arrow-native kernels (numba over
    buffer views, tokenizers with Arrow bindings, ...).

    Demonstrated with pc.utf8_length / binary byte length — chosen
    BECAUSE builtin SQL expresses them too, giving the tier a
    value-level oracle; a real deployment would put here only what
    the JVM cannot do.
    """
    import pyarrow as pa
    import pyarrow.compute as pc

    def batches(it):
        for batch in it:
            ids = batch.column(batch.schema.get_field_index(id_col))
            txt = batch.column(batch.schema.get_field_index(text_col))
            yield pa.RecordBatch.from_arrays(
                [
                    ids,
                    pc.utf8_length(txt).cast(pa.int64()),
                    pc.binary_length(txt).cast(pa.int64()),
                ],
                ["doc_id", "n_chars", "n_bytes"],
            )

    return df.select(id_col, text_col).mapInArrow(
        batches, "doc_id long, n_chars long, n_bytes long"
    )


def cogroup_order_stats(orders, lineitem):
    """Cogrouped ``applyInPandas``: two DataFrames grouped on the same
    key arrive as a pandas-frame PAIR per key — the §2.7 shape for
    custom joins/merges that need both sides materialized (as-of merges
    with interpolation, per-entity reconciliation, ...).

    Scale: both sides shuffle once on the key (same exchange layout as
    a join); each key's pair must fit in worker memory.  Demonstrated
    with per-order fulfillment stats whose oracle is a LEFT JOIN +
    GROUP BY, proving the cogroup path agrees with the relational one.
    """

    def stats(key, opdf: pd.DataFrame, lpdf: pd.DataFrame):
        if opdf.empty:
            return pd.DataFrame(
                columns=["o_orderkey", "n_items", "price_gap"]
            ).astype({"o_orderkey": "int64", "n_items": "int64"})
        total = float(opdf["o_totalprice"].iloc[0])
        if lpdf.empty:
            gap = None
            n = 0
        else:
            rev = (lpdf["l_extendedprice"] * (1.0 - lpdf["l_discount"])).sum()
            gap = round(total - float(rev), 4)
            n = len(lpdf)
        return pd.DataFrame(
            {"o_orderkey": [key[0]], "n_items": [n], "price_gap": [gap]}
        )

    from fletcher_spark.io import widen_by_key

    return (
        widen_by_key(orders, "o_orderkey")
        .groupBy("o_orderkey")
        .cogroup(widen_by_key(lineitem, "l_orderkey").groupBy("l_orderkey"))
        .applyInPandas(stats, "o_orderkey long, n_items long, price_gap double")
    )

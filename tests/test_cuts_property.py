"""Property-based differential testing of the exact-cut-point family
(operators/agg.py: ``exact_cut_points`` / ``_multi`` / ``_by_key``) vs
an independent DuckDB implementation of the same rank definition —
extending the r9/r10 property-test beachhead to the rank-arithmetic
core behind the four ``_cuts`` queries (VERDICT r10 ask #5).

The pinned definition (deterministic cross-engine, tie-stable): with
``n`` = count of non-null values and ranks ``r_i = ceil(i·n/k)``,
``cut_i`` = the smallest value whose cumulative count ≥ ``r_i``.  The
Spark side computes it as a two-level prefix sum over the value
histogram (coarse range buckets + keyed windows — no table-sized
window); DuckDB recomputes it as a plain cumulative-sum window over the
same histogram with INTEGER ceil arithmetic (``(i·n + k−1) // k``) —
structurally different plans, identical contract.

Hypothesis drives the adversarial shapes the fixed-fixture oracles
cannot: heavy ties (values from a ≤4-element domain), single-value
columns (span == 0 → every histogram row lands in coarse bucket 0),
all-NULL columns (empty histogram), empty inputs, negative values, and
k from 2 to 7 (k > distinct-count forces repeated cuts).
"""

from __future__ import annotations

import math

import duckdb
import pyarrow as pa
import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from fletcher_spark.operators import agg as A

# heavy-tie value domain: a handful of doubles (integer-valued, so the
# cross-engine comparison is exact), plus NULLs
st_val = st.one_of(st.none(), st.sampled_from([-2.0, 0.0, 1.0, 3.5]))
st_vals = st.lists(st_val, min_size=0, max_size=24)
st_k = st.integers(min_value=2, max_value=7)

SETTINGS = settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow, HealthCheck.function_scoped_fixture],
)


def _duck_cuts(vals: list[float | None], k: int) -> tuple[list, object]:
    """DuckDB reference: histogram → cumulative window → integer-ceil
    rank thresholds.  Returns (cuts list with NULLs as None, n)."""
    con = duckdb.connect()
    con.register("t", pa.table({"v": pa.array(vals, type=pa.float64())}))
    cut_exprs = ", ".join(
        f"min(CASE WHEN cc >= (({i} * n + {k - 1}) // {k}) THEN v END) AS cut{i}"
        for i in range(1, k)
    )
    row = con.sql(
        f"""
        WITH h AS (SELECT v, count(*)::BIGINT AS c FROM t
                   WHERE v IS NOT NULL GROUP BY v),
        cum AS (SELECT v, sum(c) OVER (ORDER BY v ROWS BETWEEN UNBOUNDED
                PRECEDING AND CURRENT ROW) AS cc FROM h),
        nn AS (SELECT sum(c) AS n FROM h)
        SELECT {cut_exprs}, (SELECT n FROM nn) AS n FROM cum, nn
        """
    ).fetchone()
    con.close()
    return list(row[: k - 1]), row[k - 1]


@given(vals=st_vals, k=st_k)
@SETTINGS
def test_exact_cut_points_matches_duckdb(spark, vals, k):
    df = spark.createDataFrame([(v,) for v in vals], "x double")
    got = A.exact_cut_points(df, "x", k, n_coarse=4).collect()[0]
    exp_cuts, exp_n = _duck_cuts(vals, k)
    assert list(got["cuts"]) == exp_cuts, (vals, k)
    assert got["n"] == exp_n, (vals, k)


@given(a=st_vals, b=st_vals, k=st_k)
@SETTINGS
def test_exact_cut_points_multi_matches_single(spark, a, b, k):
    """The melted multi-column pipeline must equal the single-column
    reference per metric; an all-NULL metric degrades to [] (the
    documented assign_cut_buckets contract), never to NULL cuts."""
    m = max(len(a), len(b))
    a = a + [None] * (m - len(a))
    b = b + [None] * (m - len(b))
    df = spark.createDataFrame(list(zip(a, b)), "x double, y double")
    got = A.exact_cut_points_multi(df, ["x", "y"], k, n_coarse=4).collect()[0]
    for col, vals in (("x", a), ("y", b)):
        exp_cuts, _ = _duck_cuts(vals, k)
        if all(v is None for v in vals):
            assert list(got[f"{col}_cuts"]) == [], (col, vals, k)
        else:
            assert list(got[f"{col}_cuts"]) == exp_cuts, (col, vals, k)


st_keyed = st.lists(
    st.tuples(st.integers(min_value=0, max_value=2), st_val),
    min_size=0,
    max_size=24,
)


@given(rows=st_keyed, k=st_k)
@SETTINGS
def test_exact_cut_points_by_key_matches_duckdb(spark, rows, k):
    """Keyed cuts: each key group must independently match the unkeyed
    reference on that group's values; keys whose values are all NULL
    produce NO row (empty-group contract — the melt filters NULLs
    before the histogram, so the key never reaches the aggregate)."""
    df = spark.createDataFrame(
        [(g, v) for g, v in rows], "g int, x double"
    )
    got = {
        r["g"]: (list(r["cuts"]), r["n"])
        for r in A.exact_cut_points_by_key(df, ["g"], "x", k, n_coarse=4).collect()
    }
    by_key: dict[int, list] = {}
    for g, v in rows:
        by_key.setdefault(g, []).append(v)
    for g, vals in by_key.items():
        if all(v is None for v in vals):
            assert g not in got, (g, vals, k)
        else:
            exp_cuts, exp_n = _duck_cuts(vals, k)
            assert got[g] == (exp_cuts, exp_n), (g, vals, k)
    assert set(got) == {
        g for g, vals in by_key.items() if any(v is not None for v in vals)
    }


def test_assign_cut_buckets_partition_sizes(spark):
    """End-to-end rank sanity on a tie-free column: with n divisible by
    k and all-distinct values, the map-side bucket assignment must give
    EXACTLY equal bucket sizes (the equi-depth contract ntile also
    guarantees in this regime)."""
    n, k = 120, 6
    df = spark.range(n).select((F.col("id") * 7 % 997).cast("double").alias("x"))
    cuts = A.exact_cut_points(df, "x", k)
    out = (
        df.crossJoin(F.broadcast(cuts))
        .select(A.assign_cut_buckets("x").alias("b"))
        .groupBy("b")
        .count()
        .collect()
    )
    sizes = {r["b"]: r["count"] for r in out}
    assert sizes == {i: n // k for i in range(1, k + 1)}, sizes

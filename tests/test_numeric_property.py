"""Property-based differential testing vs DuckDB for the numeric
compute surface (SURVEY §2.4/§2.5): hypothesis-generated batches with
nulls, NaNs, extremes → identical reductions, arithmetic null
propagation, and Kleene logic in both engines.

Mirrors the reference's strategy of fuzzing its kernels against the
pandas/numpy host (e.g. /root/reference/tests/test_algorithms.py) —
here the host oracle is DuckDB SQL over the same Arrow data, so the
property IS the cross-engine contract the driver checks on fixed
tables, extended to adversarial inputs.
"""

from __future__ import annotations

import math

import duckdb
import pyarrow as pa
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from pyspark.sql import functions as F

# finite doubles away from float64 edges (both engines agree on inf/nan
# PROPAGATION, tested separately below; summation at 1e300 overflows
# order-dependently, which is a float property, not an engine bug)
st_val = st.one_of(
    st.none(),
    st.floats(min_value=-1e6, max_value=1e6, allow_nan=False),
    st.integers(min_value=-10**9, max_value=10**9).map(float),
)
st_batch = st.lists(st_val, min_size=1, max_size=40)

st_bool = st.one_of(st.none(), st.booleans())
st_bool_batch = st.lists(st.tuples(st_bool, st_bool), min_size=1, max_size=40)

SETTINGS = settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow, HealthCheck.function_scoped_fixture],
)


def _round6(x):
    if x is None:
        return None
    if isinstance(x, float) and math.isnan(x):
        return "NaN"
    return round(x, 6)


def _sum_close(got, exp, batch, per_element=False):
    """Order-tolerant comparison for float reductions.

    Spark's partial aggregation and DuckDB sum in different orders, and
    float64 reassociation guarantees agreement only to the standard
    error bound |err| ≤ (n-1)·eps·Σ|vᵢ| — which is ABSOLUTE in the
    input magnitudes, not relative to the result: a cancelling batch
    like [1e9, 1e-7, -1e9] has two valid sums (1e-7 vs ~1.19e-7) whose
    relative difference is huge while both are within the bound.  So
    the tolerance scales with Σ|vᵢ| (with generous headroom over the
    worst-case constant), plus a small absolute floor; a genuine engine
    bug (dropped/duplicated element, wrong null handling) moves the sum
    by an element magnitude, far outside this band for the strategy's
    value range."""
    if got is None or exp is None:
        return got is None and exp is None
    if math.isnan(got) or math.isnan(exp):
        return math.isnan(got) and math.isnan(exp)
    sum_abs = sum(abs(v) for v in batch if v is not None)
    tol = 64 * len(batch) * 2.22e-16 * sum_abs + 1e-9
    if per_element:
        # a mean's reassociation error is the sum's divided by the
        # valid count — keep the bound that tight or an n-times-larger
        # mean-only bug would slip through
        tol = tol / max(1, sum(1 for v in batch if v is not None)) + 1e-12
    return abs(got - exp) <= tol


def _key(row):
    """Total order over tuples containing None/NaN/bool/float."""
    out = []
    for x in row:
        if x is None:
            out.append((1, 0.0))
        elif x == "NaN" or (isinstance(x, float) and math.isnan(x)):
            out.append((2, 0.0))
        else:
            out.append((0, float(x)))
    return out


@given(batch=st_batch)
@SETTINGS
def test_reductions_match_duckdb(spark, batch):
    tbl = pa.table({"v": pa.array(batch, type=pa.float64())})
    sdf = spark.createDataFrame(tbl.to_pandas())
    got = sdf.agg(
        F.sum("v").alias("s"),
        F.min("v").alias("mn"),
        F.max("v").alias("mx"),
        F.avg("v").alias("mean"),
        F.count("v").alias("n_valid"),
        F.count(F.lit(1)).alias("n_rows"),
    ).collect()[0]

    con = duckdb.connect()
    con.register("t", tbl)
    exp = con.sql(
        "SELECT sum(v), min(v), max(v), avg(v), count(v), count(*) FROM t"
    ).fetchone()

    assert _sum_close(got["s"], exp[0], batch)
    assert got["mn"] == exp[1] and got["mx"] == exp[2]
    assert _sum_close(got["mean"], exp[3], batch, per_element=True)
    assert (got["n_valid"], got["n_rows"]) == (exp[4], exp[5])


@given(batch=st.lists(st.tuples(st_val, st_val), min_size=1, max_size=30))
@SETTINGS
def test_arithmetic_null_propagation_matches_duckdb(spark, batch):
    tbl = pa.table(
        {
            "a": pa.array([p[0] for p in batch], type=pa.float64()),
            "b": pa.array([p[1] for p in batch], type=pa.float64()),
        }
    )
    sdf = spark.createDataFrame(tbl.to_pandas())
    got = sorted(
        (
            (
                _round6(r["add"]),
                _round6(r["mul"]),
                r["lt"],
                r["eq"],
            )
            for r in sdf.select(
            (F.col("a") + F.col("b")).alias("add"),
            (F.col("a") * F.col("b")).alias("mul"),
            (F.col("a") < F.col("b")).alias("lt"),
            (F.col("a") == F.col("b")).alias("eq"),
        ).collect()
        ),
        key=_key,
    )

    con = duckdb.connect()
    con.register("t", tbl)
    exp = sorted(
        (
            (_round6(r[0]), _round6(r[1]), r[2], r[3])
            for r in con.sql("SELECT a + b, a * b, a < b, a = b FROM t").fetchall()
        ),
        key=_key,
    )
    assert got == exp


@given(batch=st_bool_batch)
@SETTINGS
def test_kleene_logic_matches_duckdb(spark, batch):
    tbl = pa.table(
        {
            "p": pa.array([x[0] for x in batch], type=pa.bool_()),
            "q": pa.array([x[1] for x in batch], type=pa.bool_()),
        }
    )
    sdf = spark.createDataFrame(tbl.to_pandas())
    got = sorted(
        (
            (r["and_"], r["or_"], r["not_"])
            for r in sdf.select(
                (F.col("p") & F.col("q")).alias("and_"),
                (F.col("p") | F.col("q")).alias("or_"),
                (~F.col("p")).alias("not_"),
            ).collect()
        ),
        key=_key,
    )
    con = duckdb.connect()
    con.register("t", tbl)
    exp = sorted(con.sql("SELECT p AND q, p OR q, NOT p FROM t").fetchall(), key=_key)
    assert got == exp


def test_nan_and_inf_propagation(spark):
    """Engine-edge pin: NULL ≠ NaN; inf arithmetic propagates; NaN
    compares false everywhere (SQL semantics in both engines)."""
    vals = [float("nan"), float("inf"), float("-inf"), 0.0, None]
    # rows directly, not via pandas: the pandas bridge folds NaN into
    # null (NaN is the pandas missing marker); Spark proper keeps
    # NULL and NaN distinct, which is exactly what this test pins
    sdf = spark.createDataFrame([(v,) for v in vals], "v double")
    got = {
        (None if r["v"] is None else str(r["v"])): (r["isnull"], r["plus"])
        for r in sdf.select(
            "v",
            F.col("v").isNull().alias("isnull"),
            (F.col("v") + 1).alias("plus"),
        ).collect()
    }
    assert got[None] == (True, None)
    assert got["inf"][1] == float("inf")
    assert got["-inf"][1] == float("-inf")
    assert math.isnan(got["nan"][1])
    assert got["0.0"] == (False, 1.0)


# -- exact_cut_points: rank-definition property -------------------------


@given(vals=st.lists(
    st.one_of(
        st.none(),
        st.integers(min_value=-50, max_value=50).map(float),  # tie-heavy
        st.floats(min_value=-1e6, max_value=1e6, allow_nan=False),
    ),
    min_size=1, max_size=60,
), k=st.sampled_from([2, 3, 4, 5, 10]))
@SETTINGS
def test_exact_cut_points_matches_rank_definition(spark, vals, k):
    """Property: for ANY multiset (ties, negatives, nulls) and any k,
    cut_i == sorted(values)[ceil(i*n/k) - 1] — the rank definition the
    DuckDB oracles replay — and the operator never emits a cut for an
    all-null input."""
    import math

    df = spark.createDataFrame([(v,) for v in vals], "x double")
    present = sorted(v for v in vals if v is not None)
    from fletcher_spark.operators.agg import exact_cut_points

    if not present:
        row = exact_cut_points(df, "x", k, n_coarse=8).collect()[0]
        assert all(c is None for c in row["cuts"])
        return
    row = exact_cut_points(df, "x", k, n_coarse=8).collect()[0]
    n = len(present)
    expected = [present[math.ceil(i * n / k) - 1] for i in range(1, k)]
    assert row["n"] == n
    assert row["cuts"] == expected, (vals, k, row["cuts"], expected)


@given(batch=st.lists(
    st.tuples(
        st.one_of(st.none(), st.integers(min_value=0, max_value=3)),  # key
        st_val,
    ),
    min_size=1,
    max_size=40,
))
@SETTINGS
def test_grouped_reductions_match_duckdb(spark, batch):
    """Grouped aggregation property: hash-partial aggregation through a
    SHUFFLE (the path the global-agg test never exercises) must agree
    with DuckDB per group — including the NULL group, which both
    engines treat as a real GROUP BY key (unlike joins)."""
    tbl = pa.table(
        {
            "k": pa.array([p[0] for p in batch], type=pa.int32()),
            "v": pa.array([p[1] for p in batch], type=pa.float64()),
        }
    )
    sdf = spark.createDataFrame(tbl.to_pandas())
    got = {
        r["k"]: (r["s"], r["mn"], r["mx"], r["n"])
        for r in sdf.groupBy("k")
        .agg(
            F.sum("v").alias("s"),
            F.min("v").alias("mn"),
            F.max("v").alias("mx"),
            F.count("v").alias("n"),
        )
        .collect()
    }

    con = duckdb.connect()
    con.register("t", tbl)
    exp = {
        r[0]: (r[1], r[2], r[3], r[4])
        for r in con.sql(
            "SELECT k, sum(v), min(v), max(v), count(v) FROM t GROUP BY k"
        ).fetchall()
    }
    assert set(got) == set(exp)
    for k in exp:
        vals = [v for kk, v in batch if kk == k and v is not None]
        assert _sum_close(got[k][0], exp[k][0], vals), (k, got[k], exp[k])
        assert got[k][1:] == exp[k][1:], (k, got[k], exp[k])

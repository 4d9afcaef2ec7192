"""Property-based differential testing of the as-of join vs DuckDB's
native ``ASOF JOIN`` (extends the r9 join-property beachhead to the one
custom relational operator, per VERDICT r9 ask #6's pattern).

``operators/relational.py:asof_join`` is the union+window formulation
(one shuffle on the key, no range cross-product); DuckDB's ``ASOF LEFT
JOIN`` is an independent implementation of the same point-in-time
semantics.  Hypothesis generates keyed, timestamped batches and both
engines must agree row-for-row, including:

* "at or before" tie handling (a right row AT the left timestamp
  matches);
* unmatched left rows survive with NULL;
* a matched right row whose VALUE is NULL yields NULL — not an older
  row's non-null value (the distinction this test was written to pin:
  ``last(value, ignorenulls=True)`` alone silently implements
  last-OBSERVATION-carried-forward over null right values, which is a
  different operator);
* tolerance masks matches strictly older than ``ts - tol`` (pandas
  ``merge_asof(tolerance=...)`` semantics) without disturbing others.

Right rows are deduplicated per (key, ts): with two right rows at the
same instant both engines tie-break arbitrarily, so that case is
excluded by construction rather than papered over with a weaker assert.
Keys and timestamps are non-null: the window formulation groups NULL
keys into one partition (Spark null-grouping) while SQL ``ON l.k = r.k``
never matches NULL — registered callers join on entity keys, which are
non-null by construction (documented at the operator).
"""

from __future__ import annotations

import duckdb
import pyarrow as pa
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

st_key = st.integers(min_value=0, max_value=3)
st_ts = st.integers(min_value=0, max_value=20)
st_val = st.one_of(st.none(), st.integers(min_value=-100, max_value=100))
st_left = st.lists(st.tuples(st_key, st_ts, st_val), min_size=0, max_size=10)
st_right = st.lists(st.tuples(st_key, st_ts, st_val), min_size=0, max_size=10)

SETTINGS = settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow, HealthCheck.function_scoped_fixture],
)

TOL = 5

_N = float("inf")


def _canon(rows):
    return sorted(tuple(_N if v is None else v for v in r) for r in rows)


@given(left=st_left, right=st_right)
@SETTINGS
def test_asof_join_matches_duckdb(spark, left, right):
    from fletcher_spark.operators import relational as R
    from pyspark.sql import functions as F

    # unique (k, t) on the right: equal-instant right rows tie-break
    # arbitrarily in both engines
    right = list({(k, t): (k, t, v) for (k, t, v) in right}.values())

    ldf = spark.createDataFrame(left or [], schema="k bigint, t bigint, lv bigint")
    rdf = spark.createDataFrame(right or [], schema="k bigint, t bigint, rv bigint")

    con = duckdb.connect()
    con.register(
        "l",
        pa.table(
            {
                "k": pa.array([r[0] for r in left], type=pa.int64()),
                "t": pa.array([r[1] for r in left], type=pa.int64()),
                "lv": pa.array([r[2] for r in left], type=pa.int64()),
            }
        ),
    )
    con.register(
        "r",
        pa.table(
            {
                "k": pa.array([r[0] for r in right], type=pa.int64()),
                "t": pa.array([r[1] for r in right], type=pa.int64()),
                "rv": pa.array([r[2] for r in right], type=pa.int64()),
            }
        ),
    )

    # unbounded as-of
    got = [
        (row["k"], row["t"], row["lv"], row["rv"])
        for row in R.asof_join(ldf, rdf, ts="t", by="k", right_cols={"rv": "rv"}).collect()
    ]
    exp = con.sql(
        "SELECT l.k, l.t, l.lv, r.rv FROM l ASOF LEFT JOIN r ON l.k = r.k AND l.t >= r.t"
    ).fetchall()
    assert _canon(got) == _canon(exp), (left, right)

    # tolerance: the most recent match is the ONLY in-tolerance candidate,
    # so masking it when stale equals pandas merge_asof(tolerance=...)
    got_tol = [
        (row["k"], row["t"], row["lv"], row["rv"])
        for row in R.asof_join(
            ldf, rdf, ts="t", by="k", right_cols={"rv": "rv"}, tolerance=F.lit(TOL)
        ).collect()
    ]
    exp_tol = con.sql(
        f"""
        SELECT l.k, l.t, l.lv,
               CASE WHEN r.t >= l.t - {TOL} THEN r.rv END AS rv
        FROM l ASOF LEFT JOIN r ON l.k = r.k AND l.t >= r.t
        """
    ).fetchall()
    assert _canon(got_tol) == _canon(exp_tol), (left, right)

    con.close()

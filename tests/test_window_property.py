"""Property-based differential testing of window functions vs DuckDB
(extends the r9 grouped-reduction / r10 join+asof beachhead to the
window family — rank/row_number/lag/lead/running aggregates were
previously pinned only by fixed-data oracle queries).

Hypothesis generates keyed batches with NULL order keys, DUPLICATE
order keys (ties), and NULL values; both engines must agree exactly.

Semantics pinned:
* NULLS FIRST ordering — Spark's ``asc`` default; DuckDB defaults to
  NULLS LAST, so the SQL says it explicitly (a silent engine-default
  divergence this test exists to keep visible);
* ties: rank() leaves gaps, dense_rank() doesn't, and a RANGE frame
  includes ALL peer rows of the current order value (the ROWS frame is
  deliberately not tested on tied keys — its tie order is
  nondeterministic in both engines, which is why every registered
  query orders ROWS frames by a unique tiebreaker);
* running sum over a RANGE frame skips NULL values but emits NULL when
  no non-null value has been seen yet (both engines);
* lag/lead default to NULL at partition edges; a unique tiebreaker
  (uid) makes their neighbor deterministic under ties.
"""

from __future__ import annotations

import duckdb
import pyarrow as pa
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

st_key = st.integers(min_value=0, max_value=2)
st_ord = st.one_of(st.none(), st.integers(min_value=0, max_value=5))
st_val = st.one_of(st.none(), st.integers(min_value=-100, max_value=100))
st_rows = st.lists(st.tuples(st_key, st_ord, st_val), min_size=0, max_size=12)

SETTINGS = settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow, HealthCheck.function_scoped_fixture],
)

_N = float("inf")


def _canon(rows):
    return sorted(tuple(_N if v is None else v for v in r) for r in rows)


@given(rows=st_rows)
@SETTINGS
def test_window_functions_match_duckdb(spark, rows):
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    data = [(k, o, v, i) for i, (k, o, v) in enumerate(rows)]
    df = spark.createDataFrame(data or [], schema="k bigint, o bigint, v bigint, uid bigint")

    con = duckdb.connect()
    con.register(
        "t",
        pa.table(
            {
                "k": pa.array([r[0] for r in data], type=pa.int64()),
                "o": pa.array([r[1] for r in data], type=pa.int64()),
                "v": pa.array([r[2] for r in data], type=pa.int64()),
                "uid": pa.array([r[3] for r in data], type=pa.int64()),
            }
        ),
    )

    w_ties = Window.partitionBy("k").orderBy(F.col("o").asc_nulls_first())
    w_uniq = Window.partitionBy("k").orderBy(
        F.col("o").asc_nulls_first(), F.col("uid").asc()
    )
    w_range = w_ties.rangeBetween(Window.unboundedPreceding, Window.currentRow)

    got = [
        tuple(row)
        for row in df.select(
            "k",
            "o",
            "v",
            "uid",
            F.rank().over(w_ties).alias("rk"),
            F.dense_rank().over(w_ties).alias("drk"),
            F.row_number().over(w_uniq).alias("rn"),
            F.lag("v", 1).over(w_uniq).alias("lg"),
            F.lead("v", 1).over(w_uniq).alias("ld"),
            F.sum("v").over(w_range).alias("rs"),
            F.count(F.lit(1)).over(w_range).alias("rc"),
        ).collect()
    ]
    exp = con.sql(
        """
        SELECT k, o, v, uid,
               rank()        OVER wt AS rk,
               dense_rank()  OVER wt AS drk,
               row_number()  OVER wu AS rn,
               lag(v, 1)     OVER wu AS lg,
               lead(v, 1)    OVER wu AS ld,
               sum(v)        OVER wr AS rs,
               count(*)      OVER wr AS rc
        FROM t
        WINDOW wt AS (PARTITION BY k ORDER BY o ASC NULLS FIRST),
               wu AS (PARTITION BY k ORDER BY o ASC NULLS FIRST, uid ASC),
               wr AS (PARTITION BY k ORDER BY o ASC NULLS FIRST
                      RANGE BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        """
    ).fetchall()
    assert _canon(got) == _canon(exp), rows

    con.close()

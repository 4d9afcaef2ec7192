"""Property-based differential testing of set-operation semantics vs
DuckDB — extends the r9/r10 beachhead (reductions → joins → windows →
as-of) to the last relational path still covered only by fixed-data
oracle queries: INTERSECT / EXCEPT / UNION in both DISTINCT and ALL
(multiset) forms.

Semantics pinned here (identical in Spark and DuckDB, and the part a
hand-rolled groupBy-count implementation most easily gets wrong):

* set ops use NULL-equal comparison — unlike join keys, two NULL rows
  ARE the same element (``intersect`` of ``[NULL]`` and ``[NULL]`` is
  ``[NULL]``);
* DISTINCT forms dedupe the RESULT (even rows duplicated only on the
  left of EXCEPT appear once);
* ALL forms are bag algebra: INTERSECT ALL keeps ``min(l, r)`` copies
  of each row, EXCEPT ALL keeps ``max(0, l - r)``;
* multi-column rows compare element-wise (a (k, v) pair is the unit,
  not the key).
"""

from __future__ import annotations

import duckdb
import pyarrow as pa
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

# tiny domains + NULLs → duplicate rows within and across sides at
# modest batch sizes, exercising every min/max count branch
st_key = st.one_of(st.none(), st.integers(min_value=0, max_value=2))
st_val = st.one_of(st.none(), st.integers(min_value=0, max_value=1))
st_rows = st.lists(st.tuples(st_key, st_val), min_size=0, max_size=12)

SETTINGS = settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow, HealthCheck.function_scoped_fixture],
)

_N = float("inf")  # None sort sentinel


def _canon(rows):
    return sorted(tuple(_N if v is None else v for v in r) for r in rows)


def _frames(spark, left, right):
    def tbl(rows):
        return pa.table(
            {
                "k": pa.array([r[0] for r in rows], type=pa.int64()),
                "v": pa.array([r[1] for r in rows], type=pa.int64()),
            }
        )

    ldf = spark.createDataFrame(left, schema="k bigint, v bigint")
    rdf = spark.createDataFrame(right, schema="k bigint, v bigint")
    con = duckdb.connect()
    con.register("l", tbl(left))
    con.register("r", tbl(right))
    return ldf, rdf, con


@given(left=st_rows, right=st_rows)
@SETTINGS
def test_setops_match_duckdb(spark, left, right):
    ldf, rdf, con = _frames(spark, left, right)
    cases = [
        (ldf.intersect(rdf), "SELECT * FROM l INTERSECT SELECT * FROM r"),
        (ldf.intersectAll(rdf), "SELECT * FROM l INTERSECT ALL SELECT * FROM r"),
        (ldf.subtract(rdf), "SELECT * FROM l EXCEPT SELECT * FROM r"),
        (ldf.exceptAll(rdf), "SELECT * FROM l EXCEPT ALL SELECT * FROM r"),
        (ldf.union(rdf).distinct(), "SELECT * FROM l UNION SELECT * FROM r"),
    ]
    for df, sql in cases:
        got = [(row["k"], row["v"]) for row in df.collect()]
        exp = con.sql(sql).fetchall()
        assert _canon(got) == _canon(exp), (sql, left, right)
    con.close()

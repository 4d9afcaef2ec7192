"""Property-based differential testing of join semantics vs DuckDB
(VERDICT r9 ask #6).

The relational join path (operators/relational.py, every q-series and
dedup candidate join) was covered only by fixed-data oracle queries;
this extends the r9 grouped-reduction beachhead to joins: hypothesis
generates keyed batches with NULL keys and duplicate keys (a tiny key
domain forces collisions), and inner / left / full / semi / anti joins
must return the identical multiset of rows in Spark and DuckDB.

Semantics pinned here:
* NULL join keys never match (both engines: ``NULL = NULL`` is unknown);
* duplicate keys multiply (inner yields the full n×m cross per key);
* left/full preserve unmatched rows with NULL-extended other side;
* Spark ``left_semi``/``left_anti`` ≡ SQL ``EXISTS``/``NOT EXISTS``
  (anti KEEPS null-key left rows — the predicate is unknown, so NOT
  EXISTS holds).
"""

from __future__ import annotations

import duckdb
import pyarrow as pa
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

# tiny key domain + NULLs → guaranteed duplicate keys, matched and
# unmatched keys, and NULL-key rows on both sides at modest sizes
st_key = st.one_of(st.none(), st.integers(min_value=0, max_value=4))
st_val = st.one_of(st.none(), st.integers(min_value=-100, max_value=100))
st_rows = st.lists(st.tuples(st_key, st_val), min_size=0, max_size=10)

SETTINGS = settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow, HealthCheck.function_scoped_fixture],
)

_N = float("inf")  # None sort sentinel: sorts after every int


def _canon(rows):
    """Order-free multiset form: rows as tuples, None made sortable."""
    return sorted(
        (tuple(_N if v is None else v for v in r) for r in rows),
    )


def _frames(spark, left, right):
    ltbl = pa.table(
        {
            "k": pa.array([r[0] for r in left], type=pa.int64()),
            "lv": pa.array([r[1] for r in left], type=pa.int64()),
        }
    )
    rtbl = pa.table(
        {
            "k": pa.array([r[0] for r in right], type=pa.int64()),
            "rv": pa.array([r[1] for r in right], type=pa.int64()),
        }
    )
    ldf = spark.createDataFrame(left, schema="k bigint, lv bigint")
    rdf = spark.createDataFrame(right, schema="k bigint, rv bigint")
    con = duckdb.connect()
    con.register("l", ltbl)
    con.register("r", rtbl)
    return ldf, rdf, con


@given(left=st_rows, right=st_rows)
@SETTINGS
def test_equi_joins_match_duckdb(spark, left, right):
    ldf, rdf, con = _frames(spark, left, right)
    cond = ldf["k"] == rdf["k"]

    for how, sql in [
        (
            "inner",
            "SELECT l.k AS lk, l.lv, r.k AS rk, r.rv FROM l JOIN r ON l.k = r.k",
        ),
        (
            "left",
            "SELECT l.k AS lk, l.lv, r.k AS rk, r.rv FROM l LEFT JOIN r ON l.k = r.k",
        ),
        (
            "full",
            "SELECT l.k AS lk, l.lv, r.k AS rk, r.rv FROM l FULL JOIN r ON l.k = r.k",
        ),
    ]:
        # explicit aliased frames: Spark coalesces the key on `on="k"`
        # equi-joins and a FULL join of self-named columns is ambiguous
        # — mirror the SQL projection instead
        lj = ldf.select(ldf["k"].alias("lk"), "lv")
        rj = rdf.select(rdf["k"].alias("rk"), "rv")
        got = [
            (row["lk"], row["lv"], row["rk"], row["rv"])
            for row in lj.join(rj, lj["lk"] == rj["rk"], how).collect()
        ]
        exp = con.sql(sql).fetchall()
        assert _canon(got) == _canon(exp), (how, left, right)

    for how, sql in [
        (
            "left_semi",
            "SELECT k, lv FROM l WHERE EXISTS (SELECT 1 FROM r WHERE r.k = l.k)",
        ),
        (
            "left_anti",
            "SELECT k, lv FROM l WHERE NOT EXISTS (SELECT 1 FROM r WHERE r.k = l.k)",
        ),
    ]:
        got = [(row["k"], row["lv"]) for row in ldf.join(rdf, cond, how).collect()]
        exp = con.sql(sql).fetchall()
        assert _canon(got) == _canon(exp), (how, left, right)

    con.close()

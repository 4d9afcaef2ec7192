"""Property-based differential testing of ROLLUP / CUBE / GROUPING SETS
vs DuckDB under NULL group keys.

The fixed-data oracle queries (rollup_flag_status, cube_status_priority,
grouping_sets_flag_status) run on TPC-H columns that are never NULL, so
the one genuinely tricky corner of grouping sets was untested: a REAL
NULL key value is indistinguishable from a rollup-generated subtotal
NULL in the output columns, and only ``GROUPING()`` separates them.
Hypothesis generates batches with NULL keys forced in, and the full
(keys, grouping-bits, count, sum) result set must match DuckDB exactly.

Semantics pinned:

* the Expand step replicates a NULL-keyed input row into the same
  grouping sets as any other row (NULL is a first-class group value);
* ``GROUPING(c)`` is 1 exactly when ``c`` is aggregated-away in that
  set, 0 when grouped — including when the grouped value is NULL;
* grouping-bit order follows the column list left→right
  (``2*GROUPING(k1) + GROUPING(k2)``, pinned explicitly in both
  engines rather than trusting GROUPING_ID arg orders);
* sums over BIGINT stay exact (no float tolerance needed).
"""

from __future__ import annotations

import duckdb
import pyarrow as pa
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

st_key = st.one_of(st.none(), st.integers(min_value=0, max_value=2))
st_val = st.one_of(st.none(), st.integers(min_value=-50, max_value=50))
st_rows = st.lists(st.tuples(st_key, st_key, st_val), min_size=1, max_size=12)

SETTINGS = settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow, HealthCheck.function_scoped_fixture],
)

_N = float("inf")


def _canon(rows):
    return sorted(tuple(_N if v is None else v for v in r) for r in rows)


SQL = """
SELECT k1, k2,
       2 * GROUPING(k1) + GROUPING(k2) AS g,
       count(*) AS n,
       sum(v)   AS sum_v
FROM t GROUP BY {sets}
"""


def _run(spark, rows, spark_grouped, duck_sets):
    """Compare a Spark grouped-DataFrame agg against DuckDB SQL."""
    agg = spark_grouped.agg(
        (2 * F.grouping("k1") + F.grouping("k2")).alias("g"),
        F.count(F.lit(1)).alias("n"),
        F.sum("v").alias("sum_v"),
    ).select("k1", "k2", "g", "n", "sum_v")
    got = [tuple(r) for r in agg.collect()]

    con = duckdb.connect()
    con.register(
        "t",
        pa.table(
            {
                "k1": pa.array([r[0] for r in rows], type=pa.int64()),
                "k2": pa.array([r[1] for r in rows], type=pa.int64()),
                "v": pa.array([r[2] for r in rows], type=pa.int64()),
            }
        ),
    )
    exp = con.sql(SQL.format(sets=duck_sets)).fetchall()
    con.close()
    assert _canon(got) == _canon(exp), (duck_sets, rows)


@given(rows=st_rows)
@SETTINGS
def test_rollup_matches_duckdb(spark, rows):
    df = spark.createDataFrame(rows, schema="k1 bigint, k2 bigint, v bigint")
    _run(spark, rows, df.rollup("k1", "k2"), "ROLLUP (k1, k2)")


@given(rows=st_rows)
@SETTINGS
def test_cube_matches_duckdb(spark, rows):
    df = spark.createDataFrame(rows, schema="k1 bigint, k2 bigint, v bigint")
    _run(spark, rows, df.cube("k1", "k2"), "CUBE (k1, k2)")


@given(rows=st_rows)
@SETTINGS
def test_grouping_sets_match_duckdb(spark, rows):
    """The general form: an explicit, non-hierarchical set list —
    ((k1, k2), (k2), ()) — which neither rollup nor cube produces."""
    df = spark.createDataFrame(rows, schema="k1 bigint, k2 bigint, v bigint")
    df.createOrReplaceTempView("t_gsets")
    agg = spark.sql(
        """
        SELECT k1, k2,
               2 * grouping(k1) + grouping(k2) AS g,
               count(*) AS n,
               sum(v)   AS sum_v
        FROM t_gsets GROUP BY GROUPING SETS ((k1, k2), (k2), ())
        """
    )
    got = [tuple(r) for r in agg.collect()]

    con = duckdb.connect()
    con.register(
        "t",
        pa.table(
            {
                "k1": pa.array([r[0] for r in rows], type=pa.int64()),
                "k2": pa.array([r[1] for r in rows], type=pa.int64()),
                "v": pa.array([r[2] for r in rows], type=pa.int64()),
            }
        ),
    )
    exp = con.sql(
        SQL.format(sets="GROUPING SETS ((k1, k2), (k2), ())")
    ).fetchall()
    con.close()
    assert _canon(got) == _canon(exp), rows

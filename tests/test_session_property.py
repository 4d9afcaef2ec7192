"""Property test: three independent session-window implementations must
agree — native ``F.session_window``, the lag/flag/cumsum window
construction, and DuckDB running the cumsum SQL.

The two Spark forms are both registered (events_session_window is the
native streaming-parity demo; sessionize_events' construction is the
batch scale path), so a semantic drift between them would ship silent
wrong answers.  The generator pins the one corner fixed data never
hits: events EXACTLY ``gap`` apart.  Both engines merge on
``diff <= gap`` (closed boundary: an event at prev_ts + gap extends
the session — probed explicitly before this test was written), which
the cumsum forms state as ``new session iff diff > gap``.

Timestamps are integer seconds with a 10 s gap so boundary collisions,
duplicate timestamps, and session chains all occur at tiny sizes.
"""

from __future__ import annotations

import datetime as dt

import duckdb
import pyarrow as pa
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import Window
from pyspark.sql import functions as F

GAP_S = 10
BASE = dt.datetime(2024, 1, 1, 0, 0, 0)

st_user = st.sampled_from(["a", "b"])
st_off = st.integers(min_value=0, max_value=60)
st_rows = st.lists(st.tuples(st_user, st_off), min_size=1, max_size=20)

SETTINGS = settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow, HealthCheck.function_scoped_fixture],
)

CUMSUM_SQL = f"""
WITH o AS (
  SELECT user_id, ts,
         CASE WHEN lag(ts) OVER w IS NULL
                   OR ts - lag(ts) OVER w > INTERVAL '{GAP_S} seconds'
              THEN 1 ELSE 0 END AS new_s
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts)
),
s AS (
  SELECT user_id, ts,
         sum(new_s) OVER (PARTITION BY user_id ORDER BY ts
                          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid
  FROM o
)
SELECT user_id, min(ts) AS s_start, count(*) AS n_events
FROM s GROUP BY user_id, sid
"""


@given(rows=st_rows)
@SETTINGS
def test_session_windows_three_way(spark, rows):
    data = [(u, BASE + dt.timedelta(seconds=off)) for u, off in rows]
    df = spark.createDataFrame(data, "user_id string, ts timestamp")

    native = [
        (r["user_id"], r["s_start"], r["n"])
        for r in (
            df.groupBy(F.session_window("ts", f"{GAP_S} seconds").alias("w"), "user_id")
            .agg(F.count(F.lit(1)).alias("n"))
            .select("user_id", F.col("w.start").alias("s_start"), "n")
        ).collect()
    ]

    w = Window.partitionBy("user_id").orderBy("ts")
    run = Window.partitionBy("user_id").orderBy("ts").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    new_s = F.when(
        F.lag("ts").over(w).isNull()
        | (F.col("ts").cast("double") - F.lag("ts").over(w).cast("double") > GAP_S),
        1,
    ).otherwise(0)
    cumsum = [
        (r["user_id"], r["s_start"], r["n"])
        for r in (
            df.withColumn("new_s", new_s)
            .withColumn("sid", F.sum("new_s").over(run))
            .groupBy("user_id", "sid")
            .agg(F.min("ts").alias("s_start"), F.count(F.lit(1)).alias("n"))
            .select("user_id", "s_start", "n")
        ).collect()
    ]

    con = duckdb.connect()
    con.register(
        "events",
        pa.table(
            {
                "user_id": pa.array([u for u, _ in data]),
                "ts": pa.array([t for _, t in data], type=pa.timestamp("us")),
            }
        ),
    )
    oracle = [(u, t, n) for u, t, n in con.sql(CUMSUM_SQL).fetchall()]
    con.close()

    assert sorted(native) == sorted(cumsum) == sorted(oracle), rows

"""Event-time window queries over ``events`` (SURVEY.md §2.8 streaming
slice).  The window logic lives in fletcher_spark/streaming/windows.py
and is shared verbatim by the Structured Streaming pipelines
(tests/test_streaming.py proves batch/stream parity); these batch
entries give it a DuckDB oracle.

``events.ts`` is stored as timestamp[ns]; io.load_tables surfaces it as
a µs TIMESTAMP (same truncation DuckDB's reader applies), so window
boundaries agree across engines.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from fletcher_spark.functions.timeutil import epoch_seconds
from fletcher_spark.io import load_tables
from fletcher_spark.queries.registry import query
from fletcher_spark.streaming import windows as W


@query(
    "events_window_tumbling",
    oracle="""
SELECT
  epoch(time_bucket(INTERVAL '10 minutes', ts))::BIGINT AS w_start_s,
  event_type,
  count(*) AS n,
  round(avg(value), 4) AS avg_value
FROM events
GROUP BY 1, 2
""",
)
def events_window_tumbling(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tumbling 10-minute event-time windows, count + mean per
    (window, event_type) — streaming/windows.py:tumbling_agg run in
    batch mode.  One shuffle on (window, key), map-side combined."""
    ev = load_tables(spark, sf_dir)["events"]
    out = W.tumbling_agg(ev, "ts", "10 minutes", "event_type")
    return out.select(
        epoch_seconds("w_start").alias("w_start_s"), "event_type", "n", "avg_value"
    )


@query(
    "events_window_sliding",
    oracle="""
WITH x AS (
  SELECT unnest([time_bucket(INTERVAL '5 minutes', ts),
                 time_bucket(INTERVAL '5 minutes', ts) - INTERVAL '5 minutes']) AS w_start,
         event_id
  FROM events
)
SELECT epoch(w_start)::BIGINT AS w_start_s, count(*) AS n
FROM x GROUP BY 1
""",
)
def events_window_sliding(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sliding windows (10 min, slide 5): every event lands in 2
    windows; Spark expands them at the scan (no self-join) —
    streaming/windows.py:sliding_agg.  The oracle reproduces the
    expansion with an explicit 2-bucket unnest."""
    ev = load_tables(spark, sf_dir)["events"]
    out = W.sliding_agg(ev, "ts", "10 minutes", "5 minutes")
    return out.select(epoch_seconds("w_start").alias("w_start_s"), "n")


@query(
    "events_session_window",
    oracle="""
WITH o AS (
  SELECT user_id, ts,
         CASE WHEN lag(ts) OVER w IS NULL
                   OR ts - lag(ts) OVER w > INTERVAL '30 minutes'
              THEN 1 ELSE 0 END AS new_s
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
),
s AS (
  SELECT user_id, ts,
         sum(new_s) OVER (PARTITION BY user_id ORDER BY ts
                          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid
  FROM o
)
SELECT epoch_us(min(ts)) // 1000000 AS s_start_s, user_id, count(*) AS n_events
FROM s GROUP BY user_id, sid
""",
)
def events_session_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Native gap-merged session windows (30 min) per user —
    ``F.session_window``, the streaming-stateful analog of the
    sessionize operator; the oracle re-derives sessions with the
    lag/flag/cumsum construction.  Shuffles once on user_id."""
    ev = load_tables(spark, sf_dir)["events"]
    out = W.session_agg(ev, "ts", "30 minutes", "user_id")
    return out.select(
        epoch_seconds("s_start").alias("s_start_s"), "user_id", "n_events"
    )


@query(
    "events_json_props",
    oracle="""
SELECT
  event_type,
  count(*) AS n,
  round(avg(CAST(json_extract_string(props, '$.k') AS BIGINT)), 4) AS avg_k,
  max(CAST(json_extract_string(props, '$.k') AS BIGINT))           AS max_k
FROM events
WHERE CAST(json_extract_string(props, '$.k') AS BIGINT) > 50
GROUP BY event_type
""",
)
def events_json_props(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semi-structured column compute: parse the JSON ``props`` payload
    with a typed schema (``from_json`` — JVM Jackson parser, codegen
    downstream), filter on the extracted field, aggregate per type.
    The schema-on-read path every event pipeline needs; the reference
    has no JSON support (Spark-first addition).

    Scale: parsing happens in the scan stage; the extracted column is
    then an ordinary int (filter → partial+final agg).  A malformed row
    yields NULL (PERMISSIVE mode), not a job failure.
    """
    from pyspark.sql import types as sqlt

    ev = load_tables(spark, sf_dir)["events"]
    schema = sqlt.StructType([sqlt.StructField("k", sqlt.LongType())])
    k = F.from_json(F.col("props"), schema)["k"]
    return (
        ev.withColumn("k", k)
        .filter(F.col("k") > 50)
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.avg("k"), 4).alias("avg_k"),
            F.max("k").alias("max_k"),
        )
    )


@query(
    "events_click_attribution",
    oracle="""
SELECT
  v.event_id                      AS view_id,
  c.event_id                      AS click_id,
  v.user_id                       AS user_id,
  epoch_us(c.ts) - epoch_us(v.ts) AS gap_us
FROM events v
JOIN events c
  ON v.user_id = c.user_id
 AND c.ts >= v.ts
 AND c.ts <= v.ts + INTERVAL '15 minutes'
WHERE v.event_type = 'view' AND c.event_type = 'click'
""",
)
def events_click_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Interval (time-bounded) join: every view paired with same-user
    clicks within the following 15 minutes — the attribution shape.
    Runs through streaming/windows.py:interval_join, the SAME function
    the stream-stream join uses (watermarked parity asserted in
    tests/test_streaming.py); here in batch mode with a DuckDB oracle.

    Scale: both sides shuffle once on user_id; the time bounds are a
    per-key residual, and in streaming they also bound the join state
    (evict at watermark + 15 min)."""
    ev = load_tables(spark, sf_dir)["events"]
    views = ev.filter(F.col("event_type") == "view").select(
        F.col("event_id").alias("view_id"),
        "user_id",
        F.col("ts").alias("v_ts"),
        F.col("ts_us").alias("v_us"),
    )
    clicks = ev.filter(F.col("event_type") == "click").select(
        F.col("event_id").alias("click_id"),
        "user_id",
        F.col("ts").alias("c_ts"),
        F.col("ts_us").alias("c_us"),
    )
    out = W.interval_join(views, clicks, "user_id", "v_ts", "c_ts", "15 minutes")
    return out.select(
        "view_id",
        "click_id",
        "user_id",
        (F.col("c_us") - F.col("v_us")).alias("gap_us"),
    )


@query(
    "events_variant_props",
    oracle="""
SELECT
  event_type,
  count(*)                                   AS n,
  round(avg(json_extract(props, '$.k')::BIGINT), 4) AS avg_k
FROM events
WHERE json_extract(props, '$.k')::BIGINT <= 20
GROUP BY event_type
""",
)
def events_variant_props(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semi-structured access via Spark 4 VariantType: ``parse_json``
    once into a variant, ``variant_get`` typed paths — unlike the
    ``from_json`` path (events_json_props) no full struct schema is
    declared or materialized, and sparse access skips undeclared
    fields.  The modern lake pattern for heterogenous event payloads;
    at 100 TB variant columns shred to parquet and prune like any
    other (the filter here reaches the scan as a residual)."""
    ev = load_tables(spark, sf_dir)["events"]
    k = F.expr("variant_get(parse_json(props), '$.k', 'long')")
    return (
        ev.withColumn("k", k)
        .filter(F.col("k") <= 20)
        .groupBy("event_type")
        .agg(F.count(F.lit(1)).alias("n"), F.round(F.avg("k"), 4).alias("avg_k"))
    )

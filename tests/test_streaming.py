"""Structured Streaming parity: the window transformations in
fletcher_spark/streaming/windows.py produce IDENTICAL results when fed
from ``readStream`` (availableNow trigger, complete/update modes) as
from the batch reader — the Structured Streaming contract, asserted.
"""

from __future__ import annotations

import pytest

from fletcher_spark.io import load_tables
from fletcher_spark.sources.stream import stream_events
from fletcher_spark.streaming import windows as W
from tests.conftest import SF_DIR


def _run_stream(sdf, name):
    q = (
        sdf.writeStream.format("memory")
        .queryName(name)
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    return q


def _rows(df):
    return sorted([tuple(r) for r in df.collect()])


@pytest.mark.parametrize(
    "name,fn",
    [
        ("tumbling", lambda df: W.tumbling_agg(df, "ts", "10 minutes", "event_type")),
        ("sliding", lambda df: W.sliding_agg(df, "ts", "10 minutes", "5 minutes")),
        ("sessions", lambda df: W.session_agg(df, "ts", "30 minutes", "user_id")),
    ],
)
def test_stream_matches_batch(spark, name, fn):
    batch = fn(load_tables(spark, SF_DIR)["events"])
    expected = _rows(batch)

    stream = fn(W.with_watermark(stream_events(spark, SF_DIR), "ts", "10 days"))
    qname = f"stream_{name}"
    q = _run_stream(stream, qname)
    try:
        got = _rows(spark.sql(f"SELECT * FROM {qname}"))
    finally:
        q.stop()
    assert got == expected
    assert len(got) > 0


def test_stateful_profile_matches_batch(spark):
    """applyInPandasWithState running profile: after consuming the whole
    stream (availableNow), per-user state must equal the batch
    groupBy aggregate."""
    from pyspark.sql import functions as F

    from fletcher_spark.streaming.stateful import running_user_profile

    ev = load_tables(spark, SF_DIR)["events"]
    expected = _rows(
        ev.groupBy("user_id").agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum(F.coalesce("value", F.lit(0.0))), 4).alias("total_value"),
            F.max("ts_us").alias("last_ts_us"),
        )
    )

    stream = running_user_profile(stream_events(spark, SF_DIR))
    q = (
        stream.writeStream.format("memory")
        .queryName("stateful_profile")
        .outputMode("update")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    try:
        got = _rows(spark.sql("SELECT * FROM stateful_profile"))
    finally:
        q.stop()
    assert got == expected
    assert len(got) > 0


def test_streaming_exact_dedup(spark):
    """Streaming exact dedup: dropDuplicatesWithinWatermark on a key
    derived from the payload — the streaming twin of dedup_exact.
    availableNow over a bounded source must keep exactly one row per
    key (state bounded by the watermark horizon at 100 TB)."""
    from pyspark.sql import functions as F

    ev = stream_events(spark, SF_DIR)
    keyed = ev.withColumn("k", F.col("user_id") % 50)
    deduped = W.with_watermark(keyed, "ts", "10 days").dropDuplicatesWithinWatermark(["k"])
    q = (
        deduped.writeStream.format("memory")
        .queryName("stream_dedup")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    try:
        rows = spark.sql("SELECT k, count(*) n FROM stream_dedup GROUP BY k").collect()
    finally:
        q.stop()
    assert len(rows) > 0
    assert all(r["n"] == 1 for r in rows)

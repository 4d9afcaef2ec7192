"""Event-time windowing (SURVEY.md §2.8 gap: the reference has no
streaming at all — Spark Structured Streaming supplies it).

The transformation functions here are **source-agnostic**: they take
any DataFrame (batch or streaming) with an event-time column and apply
the identical window logic, so the batch oracle queries in
queries/events.py and the streaming pipelines in tests/test_streaming.py
share one code path — the Structured Streaming guarantee that a
streaming query is semantically a repeated batch query, made literal.

Scale: windowed aggregation shuffles on (window, keys); with a
watermark the state store retains only windows newer than the horizon,
so state is bounded regardless of stream length.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def tumbling_agg(
    df: DataFrame,
    ts_col: str = "ts",
    duration: str = "10 minutes",
    key: str | None = "event_type",
    value_decimal_scale: int | None = None,
) -> DataFrame:
    """Tumbling event-time window: count + mean per (window, key).

    Batch and streaming take the same plan shape (partial aggregate →
    shuffle on window+key → final); in streaming the shuffle feeds the
    state store instead.

    ``value_decimal_scale``: when the value column carries fixed-point
    data (e.g. 2-decimal money/measurements), pass its scale and the
    mean is computed from an EXACT scaled-integer sum — per row
    ``floor(value·10^s + 0.5)`` (unambiguous: the doubles sit within
    ~1e-9 of the exact fixed-point values), associative BIGINT
    accumulation, then the same correctly-rounded int→double + two IEEE
    divisions in any engine — order-independent and bit-reproducible
    across partition layouts, engines, and reruns, and long-typed all
    the way through whole-stage codegen (a DECIMAL(28,s) sum falls off
    the long-backed fast path — measured 3.5× on the q1 shape).  The
    default double ``avg`` is order-DEPENDENT: at 10× scale its
    accumulated error straddled a round-half tie (a window whose exact
    mean was 12.94875) and two engines legitimately disagreed at the
    4th decimal (caught r13 at .tmp/sf1).  No rounding is applied in
    the exact mode: the division operands are bit-identical everywhere,
    so the quotient is too, while rounding a double re-introduces
    representation ties.
    """
    keys = [F.window(ts_col, duration).alias("w")] + ([F.col(key)] if key else [])
    if value_decimal_scale is None:
        aggs = [F.count(F.lit(1)).alias("n"), F.round(F.avg("value"), 4).alias("avg_value")]
        post = ["n", "avg_value"]
        out = df.groupBy(*keys).agg(*aggs)
        return out.select(
            F.col("w.start").alias("w_start"), *([key] if key else []), *post
        )
    mult = 10 ** value_decimal_scale
    scaled = F.floor(F.col("value") * mult + F.lit(0.5)).cast("long")
    out = df.groupBy(*keys).agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(scaled).alias("_sv"),
    )
    return out.select(
        F.col("w.start").alias("w_start"),
        *([key] if key else []),
        "n",
        (F.col("_sv").cast("double") / float(mult) / F.col("n")).alias("avg_value"),
    )


def sliding_agg(
    df: DataFrame,
    ts_col: str = "ts",
    duration: str = "10 minutes",
    slide: str = "5 minutes",
) -> DataFrame:
    """Sliding window: each event lands in duration/slide windows; Spark
    expands windows at the scan (no self-join)."""
    return (
        df.groupBy(F.window(ts_col, duration, slide).alias("w"))
        .agg(F.count(F.lit(1)).alias("n"))
        .select(F.col("w.start").alias("w_start"), "n")
    )


def session_agg(
    df: DataFrame,
    ts_col: str = "ts",
    gap: str = "30 minutes",
    key: str = "user_id",
) -> DataFrame:
    """Native session windows (gap-merged): per-key sessions close after
    ``gap`` of silence.  The batch analog of the sessionize operator
    (fletcher_spark/operators/relational.py:sessionize) — in streaming,
    ``session_window`` + watermark maintains open sessions as state.

    The session start is emitted as ``min(ts)`` — the same value as
    ``w.start`` (a session starts at its first event) — NOT the window
    struct field, to keep downstream predicates sound (r13): Catalyst
    pushes filters on grouping expressions below the aggregate, and the
    pre-merge logical definition of ``session_window.start`` is the
    per-ROW ``ts`` (merge happens later, in the exec), so a pushed
    predicate silently filters EVENTS instead of sessions — caught at
    the 100× ledger sweep as phantom split sessions under a
    start-keyed slice (a tumbling ``window().start`` pushdown is sound,
    which is presumably why the rule fires here too).  An aggregate
    output is a pushdown barrier, closing the hole for every consumer."""
    return (
        df.groupBy(F.session_window(ts_col, gap).alias("w"), F.col(key))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.min(ts_col).alias("s_start"),
        )
        .select(
            "s_start",
            key,
            "n_events",
        )
    )


def with_watermark(df: DataFrame, ts_col: str = "ts", delay: str = "1 hour") -> DataFrame:
    """Late-data horizon for the streaming variants: state older than
    max(event_time) - delay is evictable; later rows are dropped."""
    return df.withWatermark(ts_col, delay)


def interval_join(
    left: DataFrame,
    right: DataFrame,
    key: str = "user_id",
    left_ts: str = "l_ts",
    right_ts: str = "r_ts",
    max_delay: str = "15 minutes",
) -> DataFrame:
    """Stream-stream interval (time-bounded) join: each left row pairs
    with right rows for the same key whose timestamp falls in
    [left_ts, left_ts + max_delay] — the click-attribution shape.

    Works identically on batch and streaming inputs (same plan algebra);
    in streaming BOTH sides must carry watermarks, and because the join
    condition bounds right_ts in both directions relative to left_ts,
    the state store can evict rows older than watermark + max_delay —
    state stays O(key-rate × max_delay) regardless of stream length.
    Batch at 100 TB: one shuffle on the key for both sides, the range
    predicate evaluates as a post-join residual within each key group.

    Scale note (batch, hot keys): the residual form's intermediates are
    Σ n_left(k)·n_right(k) per key — quadratic for a key with millions
    of rows on both sides.  Streaming is immune (state eviction bounds
    the live window to max_delay), and this module's callers join
    filtered event subsets where per-key cardinality is small.  For a
    BATCH range self-join over raw events, bin by time bucket instead —
    the (key, ts div delay) + explode-{b, b+1} pattern in
    queries/relational.py:range_join_follows (r8: 67× fewer candidates,
    13× → 1.9× wall at 10× data); it is not applied here because the
    derived-bucket equality key is unnecessary state-complexity for the
    streaming path this function exists to serve.
    """
    return left.join(
        right,
        (left[key] == right[key])
        & (right[right_ts] >= left[left_ts])
        & (right[right_ts] <= left[left_ts] + F.expr(f"INTERVAL {max_delay}")),
    ).drop(right[key])

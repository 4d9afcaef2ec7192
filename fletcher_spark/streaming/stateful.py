"""Custom stateful streaming operators (``applyInPandasWithState``).

The built-in windows (streaming/windows.py) cover time-bucketed state;
this is the escape hatch for arbitrary per-key state machines — the
builder brief's "custom stateful operator" slot.  The operator here is
a per-user running profile (event count, value sum, last-seen
timestamp): each micro-batch's rows for a key arrive as pandas
DataFrames, the GroupState carries (count, sum, last_ts) across
batches, and each batch emits the updated profile.

Scale: state lives in the executor state store partitioned by the
group key (same shuffle as a groupBy); a processing-time timeout
evicts idle keys, bounding state like a watermark bounds windows.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

OUTPUT_SCHEMA = "user_id long, n_events long, total_value double, last_ts_us long"
STATE_SCHEMA = "n long, total double, last_us long"


def _update_profile(
    key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    (user_id,) = key
    if state.exists:
        n, total, last_us = state.get
    else:
        n, total, last_us = 0, 0.0, 0
    for pdf in pdfs:
        n += len(pdf)
        total += float(pdf["value"].fillna(0.0).sum())
        if len(pdf):
            last_us = max(last_us, int(pdf["ts_us"].max()))
    state.update((n, total, last_us))
    yield pd.DataFrame(
        [(user_id, n, round(total, 4), last_us)],
        columns=["user_id", "n_events", "total_value", "last_ts_us"],
    )


def running_user_profile(events: DataFrame) -> DataFrame:
    """Per-user running (count, value-sum, last-seen) maintained as
    explicit GroupState — works on a streaming DataFrame; each
    micro-batch emits updated profiles for the keys it touched."""
    return events.groupBy("user_id").applyInPandasWithState(
        _update_profile,
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def make_first_seen_processor(out_cols: list[str], ttl_ms: int | None = None):
    """Build the ``FirstSeen`` StatefulProcessor used by
    :func:`streaming_first_seen`: emit a key's first row only, with the
    seen-marker ``ValueState`` optionally TTL'd so "seen" expires and
    the key is emitted again — dedup within the last N hours.

    Module-level factory (rather than a class nested in the query
    function) so a pure-Python fake ``StatefulProcessorHandle`` /
    ``ValueState`` can drive init/handleInputRows through the
    first-seen, duplicate-drop, and TTL-expired sequences in a unit
    test — this container has no protobuf runtime, so the state-server
    wiring itself stays env-gated (tests/test_streaming.py).  The class
    is still DEFINED inside the factory so cloudpickle serializes it by
    value and Spark Python workers never need fletcher_spark importable
    (same constraint as pipeline/multimodal.py:_make_fake_decode).
    """
    from pyspark.sql.streaming.stateful_processor import (
        StatefulProcessor,
        StatefulProcessorHandle,
    )

    out_cols = list(out_cols)

    class FirstSeen(StatefulProcessor):
        def init(self, handle: StatefulProcessorHandle) -> None:
            self._seen = handle.getValueState("seen", "seen boolean", ttl_ms)

        def handleInputRows(self, key, rows, timer_values):
            if self._seen.exists():
                return
            first = None
            for pdf in rows:
                if len(pdf):
                    first = pdf.iloc[[0]][out_cols].astype(str)
                    break
            # mark seen only once a row is actually EMITTED: an input of
            # empty-only chunks (the Arrow serializer does produce empty
            # frames) must not suppress the key's true first row forever
            if first is not None:
                self._seen.update((True,))
                yield first

        def close(self) -> None:
            pass

    return FirstSeen()


def streaming_first_seen(
    df: DataFrame,
    key_col: str = "fp",
    payload_cols: tuple[str, ...] = ("doc_id",),
    ttl_ms: int | None = None,
) -> DataFrame:
    """Streaming exact dedup on the Spark 4 ``transformWithStateInPandas``
    API: emit each key's FIRST row only, remembering seen keys in a
    per-key ``ValueState`` — optionally with a TTL so state self-expires
    (the feature the older ``applyInPandasWithState`` path cannot
    express; with a TTL this is "dedup within the last N hours", the
    production corpus-ingest shape where unbounded seen-sets are not an
    option).

    Scale: state is keyed by the dedup fingerprint and lives in the
    executor state store (same shuffle as a groupBy on the key); TTL
    bounds its size.  Emits at most one row per key ever (append mode).

    The processor comes from :func:`make_first_seen_processor`, which
    defines the class inside the factory so cloudpickle serializes it
    by value — Spark Python workers never need fletcher_spark
    importable (same constraint as
    pipeline/multimodal.py:_make_fake_decode).

    Runtime requirements: the RocksDB state store provider
    (``spark.sql.streaming.stateStore.providerClass``) and the
    ``protobuf`` package (the API's Python driver worker speaks
    protobuf to the state server; part of standard pyspark extra
    deps).  tests/test_streaming.py gates on the latter.
    """
    out_cols = [key_col, *payload_cols]
    out_schema = ", ".join(f"{c} string" for c in out_cols)
    return (
        df.select([F.col(c).cast("string") for c in out_cols])
        .groupBy(key_col)
        .transformWithStateInPandas(
            statefulProcessor=make_first_seen_processor(out_cols, ttl_ms),
            outputStructType=out_schema,
            outputMode="Append",
            # State TTL requires a clock: Spark rejects ttl on
            # timeMode="None", so the TTL path switches to
            # ProcessingTime (timers unused; only state expiry).
            timeMode="ProcessingTime" if ttl_ms is not None else "None",
        )
    )


def ttl_first_seen_batch(
    df: DataFrame,
    key_col: str,
    ts_col: str,
    ttl_us: int,
) -> DataFrame:
    """BATCH-PARITY replay of :func:`streaming_first_seen` with a TTL —
    the driver-checkable contract for the TTL state semantics the
    protobuf-gated ``transformWithStateInPandas`` tests can't exercise
    in this environment.

    Semantics (identical to ValueState-with-TTL over an event-time
    ordered stream): per key, a row is EMITTED iff no emitted row of the
    same key lies within the preceding ``ttl_us`` — i.e. the emit chain
    ``t_1 = min(ts)``, ``t_{k+1} = min{ts > t_k + ttl}``.  Suppressed
    rows do NOT refresh the state (the processor returns before
    ``state.update``), which is why the chain jumps from emit to emit —
    bucketed dedup (first-per-window) is NOT equivalent.

    Output: one row per key — (key, n_emitted, first_us, last_emit_us).

    Scale: ONE key-hashed shuffle with an in-partition (key, ts) sort,
    then ``mapInPandas`` over whole sorted partitions — NOT
    ``applyInPandas``: with billions of small keys the per-group
    invocation overhead dominates, while a partition pass pays Python
    entry once per Arrow batch regardless of key count (the same reason
    the streaming state store iterates its sorted partition, not one
    callback per key).  Chain state (current key, last emit) carries
    across Arrow batch boundaries inside the iterator; per-key work is
    O(emits × log n) via searchsorted jumps, not O(n) Python steps."""
    import numpy as np

    key_type = df.schema[key_col].dataType.simpleString()
    out_schema = (
        f"{key_col} {key_type}, n_emitted long, first_us long, last_emit_us long"
    )
    kc, tc = key_col, ts_col
    ttl = int(ttl_us)
    cols = [kc, "n_emitted", "first_us", "last_emit_us"]

    def partition_chains(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        # carry-over chain state across Arrow batches within a partition
        cur = None  # (key, n_emit, first, last_emit)

        def advance(state, ts: "np.ndarray"):
            key, n_emit, first, last = state
            i = 0
            if n_emit:  # skip everything still inside the live TTL
                i = int(np.searchsorted(ts, last + ttl, side="right"))
            else:
                first = int(ts[0])
            n = len(ts)
            while i < n:
                last = int(ts[i])
                n_emit += 1
                i = int(np.searchsorted(ts, last + ttl, side="right"))
            return (key, n_emit, first, last)

        for pdf in it:
            if not len(pdf):
                continue
            keys = pdf[kc].to_numpy()
            ts_all = pdf[tc].to_numpy(dtype="int64")
            # rows arrive sorted by (key, ts); process each key's run
            bounds = np.flatnonzero(keys[1:] != keys[:-1]) + 1
            starts = np.concatenate(([0], bounds))
            ends = np.concatenate((bounds, [len(keys)]))
            out = []
            for s, e in zip(starts, ends):
                key = keys[s]
                ts = ts_all[s:e]
                if cur is not None and cur[0] == key:
                    cur = advance(cur, ts)
                    continue
                if cur is not None:
                    out.append(cur)
                cur = advance((key, 0, 0, 0), ts)
            if out:
                yield pd.DataFrame(out, columns=cols)
        if cur is not None:
            yield pd.DataFrame([cur], columns=cols)

    return (
        df.select(kc, tc)
        .filter(F.col(tc).isNotNull())
        .repartition(F.col(kc))
        .sortWithinPartitions(kc, tc)
        .mapInPandas(partition_chains, out_schema)
    )

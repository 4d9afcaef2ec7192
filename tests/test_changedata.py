"""Semantic invariants for the change-data / skew / histogram batch.

The oracle-contract test already value-checks these against DuckDB;
here we pin the PROPERTIES a user relies on (tombstones really delete,
SCD2 intervals tile, salting never changes results, deciles are
balanced) on the sf0.001 tables, plus planted micro-cases where the
tables can't exercise an edge.
"""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest

from fletcher_spark.io import load_tables
from fletcher_spark.queries import registry
from tests.conftest import SF_DIR

registry.load_all()


@pytest.fixture(scope="module")
def events_last(spark):
    """Last event per user (ts desc, event_id desc), as a dict."""
    from pyspark.sql import Window

    e = load_tables(spark, SF_DIR)["events"]
    w = Window.partitionBy("user_id").orderBy(
        F.col("ts_us").desc(), F.col("event_id").desc()
    )
    rows = (
        e.select("user_id", "event_type", "value", F.row_number().over(w).alias("rk"))
        .filter("rk = 1")
        .collect()
    )
    return {r["user_id"]: (r["event_type"], r["value"]) for r in rows}


def test_cdc_merge_tombstones_and_upserts(spark, events_last):
    out = registry.QUERIES["cdc_merge_upsert"](spark, SF_DIR)
    rows = {r["custkey"]: r for r in out.collect()}
    base = {
        r["c_custkey"]: r["c_acctbal"]
        for r in load_tables(spark, SF_DIR)["customer"].collect()
    }
    for uid, (etype, value) in events_last.items():
        if etype == "error":
            assert uid not in rows, f"tombstoned key {uid} survived the merge"
        else:
            assert rows[uid]["status"] == etype
            assert rows[uid]["src"] == "upsert"
            assert rows[uid]["acctbal"] == pytest.approx(round(value, 4))
    untouched = set(base) - set(events_last)
    for k in untouched:
        assert rows[k]["src"] == "base"
        assert rows[k]["status"] == "unchanged"
        assert rows[k]["acctbal"] == pytest.approx(round(base[k], 4))


def test_scd2_intervals_tile_and_single_current(spark):
    out = registry.QUERIES["scd2_type_history"](spark, SF_DIR).collect()
    by_user: dict[int, list] = {}
    for r in out:
        by_user.setdefault(r["user_id"], []).append(r)
    for uid, rows in by_user.items():
        rows.sort(key=lambda r: r["version"])
        assert [r["version"] for r in rows] == list(range(1, len(rows) + 1))
        assert sum(r["is_current"] for r in rows) == 1
        assert rows[-1]["is_current"] and rows[-1]["valid_to_us"] is None
        for a, b in zip(rows, rows[1:]):
            assert a["valid_to_us"] == b["valid_from_us"], "intervals must tile"
            assert a["event_type"] != b["event_type"], "consecutive rows must change"


def test_ewma_matches_reference_fold(spark):
    out = {
        r["user_id"]: r
        for r in registry.QUERIES["events_ewma"](spark, SF_DIR).collect()
    }
    e = load_tables(spark, SF_DIR)["events"]
    pdf = e.select("user_id", "ts_us", "event_id", "value").toPandas()
    for uid, g in pdf.groupby("user_id"):
        g = g.sort_values(["ts_us", "event_id"])
        acc = None
        for x in g["value"]:
            acc = float(x) if acc is None else 0.3 * float(x) + 0.7 * acc
        assert out[uid]["ewma_last"] == pytest.approx(round(acc, 4))
        assert out[uid]["n_events"] == len(g)


def test_salted_join_equals_plain_join(spark):
    t = load_tables(spark, SF_DIR)
    plain = (
        t["events"]
        .join(t["customer"], F.col("user_id") == F.col("c_custkey"))
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n_joined"),
            F.round(F.avg(F.col("value") * F.col("c_acctbal")), 4).alias(
                "avg_weighted"
            ),
        )
    )
    salted = registry.QUERIES["join_salted_skew"](spark, SF_DIR)
    a = {r["event_type"]: r for r in plain.collect()}
    b = {r["event_type"]: r for r in salted.collect()}
    assert set(a) == set(b)
    for k in a:
        assert a[k]["n_joined"] == b[k]["n_joined"]
        assert a[k]["avg_weighted"] == pytest.approx(b[k]["avg_weighted"])


def test_salted_join_key_includes_salt(spark):
    plan = registry.QUERIES["join_salted_skew"](spark, SF_DIR)._jdf.queryExecution(
    ).executedPlan().toString()
    assert "salt" in plan, "salt column must appear in the physical join"
    assert "CartesianProduct" not in plan


def test_equidepth_deciles_balanced_and_ordered(spark):
    rows = sorted(
        registry.QUERIES["histogram_equidepth"](spark, SF_DIR).collect(),
        key=lambda r: r["decile"],
    )
    assert [r["decile"] for r in rows] == list(range(1, 11))
    counts = [r["n_orders"] for r in rows]
    assert max(counts) - min(counts) <= 1, "equi-depth buckets differ by at most 1"
    for a, b in zip(rows, rows[1:]):
        assert a["hi"] <= b["lo"], "decile value ranges must be ordered"
    assert sum(counts) == load_tables(spark, SF_DIR)["orders"].count()


def test_ewma_segmented_matches_direct(spark):
    """The associative segment reformulation must reproduce the direct
    per-key fold (same recurrence, different grouping) to float
    associativity."""
    from fletcher_spark.queries.changedata import ewma_segmented

    e = load_tables(spark, SF_DIR)["events"].select(
        "user_id", "ts_us", "event_id", "value"
    )
    direct = {
        r["user_id"]: r
        for r in registry.QUERIES["events_ewma"](spark, SF_DIR).collect()
    }
    seg = {r["user_id"]: r for r in ewma_segmented(e, n_segments=8).collect()}
    assert set(direct) == set(seg)
    for uid in direct:
        assert seg[uid]["n_events"] == direct[uid]["n_events"]
        # direct rounds to 4dp; compare against the rounded value
        assert round(seg[uid]["ewma_last"], 4) == pytest.approx(
            direct[uid]["ewma_last"], abs=1e-4
        )


def test_temporal_join_covers_every_event_once(spark):
    """Interval tiling ⇒ the temporal join is a PARTITION of the fact
    table: per-version counts sum to the event count exactly (no event
    dropped, none double-matched)."""
    out = registry.QUERIES["temporal_state_join"](spark, SF_DIR)
    total = sum(r["n_events"] for r in out.collect())
    assert total == load_tables(spark, SF_DIR)["events"].count()


def test_temporal_join_no_nested_loop(spark):
    plan = (
        registry.QUERIES["temporal_state_join"](spark, SF_DIR)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "BroadcastNestedLoop" not in plan, plan[:1500]
    assert "CartesianProduct" not in plan

def test_ewma_segmented_closed_form_property(spark):
    """Property (hypothesis): the closed-form suffix-weighted sum
    reproduces the sequential fold y_t = αx_t + (1-α)y_{t-1} for ANY
    event multiset — duplicate timestamps (event_id tiebreak), a
    single-event key, all events at one instant (hi == lo), hot keys
    next to singletons, and every n_segments — including segment
    boundaries falling between duplicate-ts runs."""
    from hypothesis import HealthCheck, given, settings
    from hypothesis import strategies as st

    from fletcher_spark.queries.changedata import _ALPHA, ewma_segmented

    st_events = st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=2),  # user_id (collide!)
            st.integers(min_value=0, max_value=50),  # ts bucket (ties!)
            st.floats(min_value=-1e3, max_value=1e3, allow_nan=False),
        ),
        min_size=1,
        max_size=60,
    )

    @given(events=st_events, n_segments=st.sampled_from([1, 2, 3, 8]))
    @settings(
        max_examples=15,
        deadline=None,
        suppress_health_check=[
            HealthCheck.too_slow,
            HealthCheck.function_scoped_fixture,
        ],
    )
    def check(events, n_segments):
        rows = [
            (uid, ts * 1_000_000, eid, v)
            for eid, (uid, ts, v) in enumerate(events)
        ]
        df = spark.createDataFrame(
            rows, "user_id long, ts_us long, event_id long, value double"
        )
        got = {
            r["user_id"]: (r["n_events"], r["ewma_last"])
            for r in ewma_segmented(df, n_segments=n_segments).collect()
        }
        # sequential reference fold in (ts_us, event_id) order
        by_user: dict[int, list[tuple[int, int, float]]] = {}
        for uid, ts_us, eid, v in rows:
            by_user.setdefault(uid, []).append((ts_us, eid, v))
        assert set(got) == set(by_user)
        for uid, evs in by_user.items():
            acc = None
            for _, _, x in sorted(evs):
                acc = x if acc is None else _ALPHA * x + (1.0 - _ALPHA) * acc
            n, ewma = got[uid]
            assert n == len(evs)
            assert ewma == pytest.approx(acc, rel=1e-9, abs=1e-9), (
                uid, evs, n_segments,
            )

    check()

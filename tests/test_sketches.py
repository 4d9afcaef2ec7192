"""Sketch invariants the oracle-parity check can't express by itself:
CMS never underestimates, Bloom never false-negatives, triangle
orientation produces each triangle exactly once."""

from __future__ import annotations

from pyspark.sql import functions as F

from fletcher_spark.queries import registry

registry.load_all()

SF_DIR = "/root/testdata/sf0.001"


def test_cms_never_underestimates(spark):
    rows = registry.QUERIES["sketch_cms_heavyhitters"](spark, SF_DIR).collect()
    assert len(rows) == 10
    for r in rows:
        assert r["cms_est"] >= r["exact_cnt"], r
        assert r["overestimate"] == r["cms_est"] - r["exact_cnt"]


def test_bloom_no_false_negatives_and_absent_probes_exist(spark):
    rows = registry.QUERIES["sketch_bloom_membership"](spark, SF_DIR).collect()
    assert len(rows) == 40
    verdicts = {r["verdict"] for r in rows}
    assert "fn" not in verdicts, rows
    # every key actually present must be claimed present
    for r in rows:
        if r["actual"]:
            assert r["in_bloom"], r
    # the 10 beyond-max probes guarantee true negatives (or fp) exist
    assert any(not r["actual"] for r in rows)


def test_kmv_merge_equals_direct_global_sketch(spark):
    """The 'ALL' row is built by merging per-type sketches; KMV merge
    is lossless, so it must equal the sketch built directly over all
    users — and every estimate must be exact when n_distinct < k."""
    from pyspark.sql import Window

    from fletcher_spark.io import load_tables
    from fletcher_spark.queries.sketches import _KMV_K, _KMV_SCALE

    rows = {
        r["event_type"]: r
        for r in registry.QUERIES["sketch_kmv_distinct"](spark, SF_DIR).collect()
    }
    assert "ALL" in rows
    ev = load_tables(spark, SF_DIR)["events"]
    h = (
        F.conv(F.substring(F.md5(F.col("user_id").cast("string")), 1, 14), 16, 10)
        .cast("long")
        .alias("h")
    )
    direct = (
        ev.select(h)
        .distinct()
        .withColumn("rk", F.row_number().over(Window.orderBy("h")))
        .filter(F.col("rk") <= _KMV_K)
        .agg(F.count(F.lit(1)).alias("nk"), F.max("h").alias("hk"))
        .collect()[0]
    )
    if direct["nk"] < _KMV_K:
        expected = float(direct["nk"])
    else:
        expected = round((_KMV_K - 1) * _KMV_SCALE / direct["hk"], 2)
    assert rows["ALL"]["kmv_est"] == expected, (rows["ALL"], expected)
    for r in rows.values():
        if r["exact_distinct"] < _KMV_K:
            assert r["kmv_est"] == float(r["exact_distinct"]), r


def test_triangle_corners_divisible_by_three(spark):
    """Each triangle contributes exactly 3 corner rows, so the summed
    per-node counts must be a multiple of 3 — catches double-counted
    orientations."""
    df = registry.QUERIES["graph_triangle_count"](spark, SF_DIR)
    total = df.agg(F.sum("n_triangles").alias("s")).collect()[0]["s"]
    assert total is not None and total % 3 == 0, total

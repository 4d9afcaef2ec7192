"""Property tests for the sketch library (operators/sketch.py) on
random synthetic data — the invariants the table-bound registry
queries can't establish for arbitrary inputs:

* CMS never underestimates ANY key, and a merged grid (union of two
  half-corpus grids) equals the grid built over the whole corpus;
* Bloom has no false negatives for ANY inserted key set, and a filter
  merged from shard filters equals the whole-set filter;
* KMV is exact below k, and merging arbitrary per-shard sketches
  equals the sketch built directly over the union.
"""

from __future__ import annotations

import random

import pytest
from pyspark.sql import functions as F

from fletcher_spark.operators import sketch as SK


@pytest.fixture(scope="module")
def rng():
    return random.Random(7)


def _keys_df(spark, rng, n_rows, key_space):
    rows = [(rng.randrange(key_space),) for _ in range(n_rows)]
    return spark.createDataFrame(rows, "key long")


def test_cms_never_underestimates_any_key(spark, rng):
    df = _keys_df(spark, rng, 2000, 300).persist()
    grid = SK.cms_build(df, "key", 4, 64)  # narrow grid → real collisions
    exact = df.groupBy("key").agg(F.count(F.lit(1)).alias("exact"))
    est = SK.cms_estimate(grid, exact, "key", 4, 64)
    bad = est.filter(F.col("cms_est") < F.col("exact")).collect()
    assert bad == [], bad
    df.unpersist()


def test_cms_shard_merge_equals_whole_build(spark, rng):
    df = _keys_df(spark, rng, 1500, 200).persist()
    a, b = df.filter(F.col("key") % 2 == 0), df.filter(F.col("key") % 2 == 1)
    merged = (
        SK.cms_build(a, "key", 4, 64)
        .unionByName(SK.cms_build(b, "key", 4, 64))
        .groupBy("j", "bucket")
        .agg(F.sum("c").alias("c"))
    )
    whole = SK.cms_build(df, "key", 4, 64)
    diff = merged.alias("m").join(
        whole.alias("w"), ["j", "bucket"], "full"
    ).filter(
        F.coalesce(F.col("m.c"), F.lit(-1)) != F.coalesce(F.col("w.c"), F.lit(-1))
    )
    assert diff.count() == 0
    df.unpersist()


def test_bloom_no_false_negatives_and_shard_merge(spark, rng):
    keys = spark.createDataFrame(
        [(rng.randrange(10**9),) for _ in range(500)], "key long"
    ).persist()
    bits = SK.bloom_build(keys, "key", 4096, 3)
    membership = SK.bloom_probe(bits, keys.distinct(), "key", 4096, 3)
    assert membership.filter(~F.col("in_bloom")).count() == 0
    # shard merge: union of per-shard position sets == whole-set filter
    a = SK.bloom_build(keys.filter(F.col("key") % 2 == 0), "key", 4096, 3)
    b = SK.bloom_build(keys.filter(F.col("key") % 2 == 1), "key", 4096, 3)
    merged = a.unionByName(b).distinct()
    assert merged.exceptAll(bits).count() == 0
    assert bits.exceptAll(merged).count() == 0
    keys.unpersist()


def test_kmv_exact_below_k_and_merge_lossless(spark, rng):
    # 40 distinct keys < k=64 → the estimate must be exactly 40
    small = spark.createDataFrame(
        [(i % 40,) for i in range(400)], "key long"
    )
    s = SK.kmv_summary(SK.kmv_minima(small, "key", 64))
    r = s.select(SK.kmv_estimate(F.col("nk"), F.col("hk"), 64).alias("e")).collect()
    assert r[0]["e"] == 40.0
    # merge over arbitrary sharding == direct global sketch
    big = spark.createDataFrame(
        [(rng.randrange(5000), rng.randrange(4)) for _ in range(3000)],
        "key long, shard int",
    ).persist()
    per_shard = SK.kmv_minima(big, "key", 64, ("shard",))
    merged = SK.kmv_summary(SK.kmv_merge(per_shard, 64)).collect()[0]
    direct = SK.kmv_summary(SK.kmv_minima(big, "key", 64)).collect()[0]
    assert (merged["nk"], merged["hk"]) == (direct["nk"], direct["hk"])
    big.unpersist()


def test_exact_quantiles_matches_percentile_with_nulls(spark, rng):
    """operators/agg.py:exact_quantiles must reproduce Spark's exact
    interpolated percentile() — including null skipping and even-count
    interpolation — on random grouped data."""
    from fletcher_spark.operators.agg import exact_quantiles

    rows = [
        (g, rng.randrange(50) if rng.random() > 0.1 else None)
        for g in ("a", "b", "c")
        for _ in range(rng.randrange(101, 140))
    ]
    df = spark.createDataFrame(rows, "g string, v long").persist()
    got = {
        r["g"]: (r["p25"], r["p50"], r["p95"])
        for r in exact_quantiles(
            df, "v", {"p25": 0.25, "p50": 0.5, "p95": 0.95}, ("g",)
        ).collect()
    }
    want = {
        r["g"]: (r["p25"], r["p50"], r["p95"])
        for r in df.groupBy("g")
        .agg(
            F.percentile("v", F.lit(0.25)).alias("p25"),
            F.percentile("v", F.lit(0.50)).alias("p50"),
            F.percentile("v", F.lit(0.95)).alias("p95"),
        )
        .collect()
    }
    for g in want:
        for a, b in zip(got[g], want[g]):
            assert abs(a - b) < 1e-9, (g, got[g], want[g])
    df.unpersist()

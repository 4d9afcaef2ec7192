"""Runtime join filters (Bloom / semi-join pushdown): when a selective
dimension filter guards a join, Spark can inject a runtime filter into
the FACT-side scan so most rows die before the shuffle — at 100 TB the
difference between shuffling the whole fact table and ~the matching
slice.  AQE + these flags are the mechanism; this test pins that the
injected filter appears and preserves results."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from fletcher_spark.io import load_tables
from tests.conftest import SF_DIR


@pytest.fixture()
def rf_spark(spark):
    old = {
        "spark.sql.optimizer.runtime.bloomFilter.enabled":
            spark.conf.get("spark.sql.optimizer.runtime.bloomFilter.enabled", "false"),
        "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold":
            spark.conf.get(
                "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold", "10MB"
            ),
        "spark.sql.autoBroadcastJoinThreshold":
            spark.conf.get("spark.sql.autoBroadcastJoinThreshold"),
        "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold":
            spark.conf.get(
                "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold",
                "10GB",
            ),
    }
    spark.conf.set("spark.sql.optimizer.runtime.bloomFilter.enabled", "true")
    spark.conf.set(
        "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold", "100MB"
    )
    # production default is 10GB — the whole point is "only bother for
    # big fact scans"; the test corpus is tiny, so drop the floor to
    # observe the injection mechanics
    spark.conf.set(
        "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold", "0"
    )
    # force a shuffle join: runtime filters only pay off when the fact
    # side would otherwise shuffle in full (broadcast joins already
    # prune at the probe)
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    yield spark
    for k, v in old.items():
        spark.conf.set(k, v)


def test_runtime_filter_injected_and_correct(rf_spark):
    spark = rf_spark
    t = load_tables(spark, SF_DIR)
    # selective dim filter (one part brand) guarding a fact join
    p = t["part"].filter(F.col("p_brand") == "Brand#3")
    joined = (
        t["lineitem"]
        .join(p, F.col("l_partkey") == F.col("p_partkey"))
        .agg(F.count(F.lit(1)).alias("n"), F.round(F.sum("l_extendedprice"), 4).alias("rev"))
    )
    plan = joined._jdf.queryExecution().optimizedPlan().toString()
    assert "bloom" in plan.lower() or "RuntimeFilter" in plan, plan[:2000]

    got = joined.collect()[0]
    # correctness unchanged by the runtime filter
    spark.conf.set("spark.sql.optimizer.runtime.bloomFilter.enabled", "false")
    expected = (
        t["lineitem"]
        .join(p, F.col("l_partkey") == F.col("p_partkey"))
        .agg(F.count(F.lit(1)).alias("n"), F.round(F.sum("l_extendedprice"), 4).alias("rev"))
        .collect()[0]
    )
    assert tuple(got) == tuple(expected) and got["n"] > 0

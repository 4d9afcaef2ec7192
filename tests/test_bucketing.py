"""Bucketing: pre-shuffling fact tables into bucketed storage makes
repeated joins on the bucket key exchange-free — the co-located-join
strategy the 100 TB plan relies on for fact⋈fact joins that run every
day.  This test writes bucketed copies of orders/lineitem and asserts
the join plans with NO shuffle on either side."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from fletcher_spark.io import load_tables
from tests.conftest import SF_DIR


@pytest.fixture(scope="module")
def bucketed_tables(spark, tmp_path_factory):
    t = load_tables(spark, SF_DIR)
    # explicit per-table paths: spark.sql.warehouse.dir is static, so
    # external-table locations under tmp keep the test hermetic
    warehouse = str(tmp_path_factory.mktemp("bucketed"))
    spark.sql("CREATE DATABASE IF NOT EXISTS bucketdb")
    for name, df, key in (
        ("orders_b", t["orders"], "o_orderkey"),
        ("lineitem_b", t["lineitem"], "l_orderkey"),
    ):
        (
            df.write.mode("overwrite")
            .bucketBy(8, key)
            .sortBy(key)
            .option("path", f"{warehouse}/{name}")
            .saveAsTable(f"bucketdb.{name}")
        )
    yield "bucketdb.orders_b", "bucketdb.lineitem_b"
    spark.sql("DROP TABLE IF EXISTS bucketdb.orders_b")
    spark.sql("DROP TABLE IF EXISTS bucketdb.lineitem_b")


def test_bucketed_join_has_no_exchange(spark, bucketed_tables):
    orders_t, lineitem_t = bucketed_tables
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    spark.conf.set("spark.sql.sources.v2.bucketing.enabled", "true")
    try:
        joined = (
            spark.table(lineitem_t)
            .join(spark.table(orders_t), F.col("l_orderkey") == F.col("o_orderkey"))
            .groupBy("o_orderpriority")
            .agg(F.count(F.lit(1)).alias("n"))
        )
        plan = joined._jdf.queryExecution().executedPlan().toString()
        # both sides bucketed on the join key: SortMergeJoin without any
        # Exchange under it (the aggregate after may still exchange)
        join_part = plan.split("SortMergeJoin")[1] if "SortMergeJoin" in plan else plan
        assert "SortMergeJoin" in plan, plan
        assert "Exchange hashpartitioning(l_orderkey" not in plan, plan
        assert "Exchange hashpartitioning(o_orderkey" not in plan, plan
        rows = joined.collect()
        assert sum(r["n"] for r in rows) > 0
    finally:
        spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")


def test_bucketed_groupby_has_no_exchange(spark, bucketed_tables):
    """Aggregating on the bucket key reuses the storage partitioning."""
    orders_t, _ = bucketed_tables
    agg = spark.table(orders_t).groupBy("o_orderkey").agg(F.count(F.lit(1)).alias("n"))
    plan = agg._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan, plan

"""The scale-safety plan linter (fletcher_spark/plans/lint.py): each
rule triggered by a deliberately bad plan, clean plans stay clean, and
the registry's own flagship queries pass ``assert_scale_safe``."""

from __future__ import annotations

import pandas as pd
import pytest
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from fletcher_spark.io import load_tables
from fletcher_spark.plans import assert_scale_safe, lint_plan, report
from fletcher_spark.queries import registry
from tests.conftest import SF_DIR

registry.load_all()


def rules(df):
    return {f.rule for f in lint_plan(df)}


def test_cartesian_product_is_error(spark):
    a = spark.range(10)
    b = spark.range(10).withColumnRenamed("id", "id2")
    df = a.join(b)  # no condition, neither side broadcast-hinted
    found = lint_plan(df)
    assert any(f.rule in ("cartesian-product", "broadcast-nested-loop") for f in found)
    if any(f.rule == "cartesian-product" for f in found):
        with pytest.raises(AssertionError, match="cartesian-product"):
            assert_scale_safe(df)


def test_row_python_udf_is_error(spark):
    bad = F.udf(lambda s: s.upper() if s else None, "string")
    df = spark.range(10).select(bad(F.col("id").cast("string")).alias("u"))
    assert "row-python-udf" in rules(df)
    with pytest.raises(AssertionError, match="row-python-udf"):
        assert_scale_safe(df)


def test_allow_suppresses_named_rule(spark):
    bad = F.udf(lambda s: s, "string")
    df = spark.range(10).select(bad(F.col("id").cast("string")).alias("u"))
    assert_scale_safe(df, allow={"row-python-udf"})  # documented exception


def test_global_sort_without_limit_warns(spark):
    li = load_tables(spark, SF_DIR)["lineitem"]
    df = li.orderBy("l_extendedprice")
    assert "global-sort" in rules(df)
    assert_scale_safe(df)  # warn, not error


def test_topk_does_not_warn_global_sort(spark):
    li = load_tables(spark, SF_DIR)["lineitem"]
    df = li.orderBy("l_extendedprice").limit(5)
    assert "global-sort" not in rules(df)


def test_unpartitioned_window_warns_single_partition(spark):
    li = load_tables(spark, SF_DIR)["lineitem"]
    w = Window.orderBy("l_orderkey")
    df = li.withColumn("rn", F.row_number().over(w))
    assert "single-partition-exchange" in rules(df)


def test_arrow_batched_python_is_clean(spark):
    """The approved Python tier (pandas_udf / ArrowEvalPython) must NOT
    trip the row-python rule."""
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("long")
    def plus_one(s: pd.Series) -> pd.Series:
        return s + 1

    df = spark.range(10).select(plus_one("id").alias("v"))
    assert "row-python-udf" not in rules(df)


def _funnels(df):
    from fletcher_spark.plans.lint import unbounded_single_partition_exchanges

    return unbounded_single_partition_exchanges(
        df._jdf.queryExecution().executedPlan().toString()
    )


def test_fixed_ratio_bucket_aggregate_does_not_bound(spark):
    """VERDICT r5 ask #8: groupBy(floor(key / CONSTANT)) shrinks by a
    fixed factor, so an unpartitioned window over that 'summary' is
    still a table/B single-partition sort — the lint must flag it.
    This is exactly the pre-r6 docid_gap_ranges_bucketed boundary
    shape."""
    d = load_tables(spark, SF_DIR)["documents"].select("doc_id")
    summ = (
        d.groupBy(F.floor(F.col("doc_id") / 64).alias("bk"))
        .agg(F.max("doc_id").alias("mx"))
        .select("bk", F.lead("mx").over(Window.orderBy("bk")).alias("nx"))
    )
    assert _funnels(summ), "fixed-ratio funnel must be flagged"
    assert "unbounded-single-partition-funnel" in rules(summ)


def test_adaptive_bucket_aggregate_bounds(spark):
    """The r6 fix shape: divisor is a COLUMN (bucket size derived
    in-plan from the key span), so the summary is ~sqrt(span) rows —
    cardinality-bounded, lint stays quiet."""
    d = spark.range(1000).select(F.col("id").alias("doc_id"))
    bsz = d.agg(
        F.greatest(
            F.lit(64), F.ceil(F.sqrt(F.max("doc_id") - F.min("doc_id") + F.lit(1)))
        ).alias("bsz")
    )
    summ = (
        d.crossJoin(F.broadcast(bsz))
        .groupBy(F.floor(F.col("doc_id") / F.col("bsz")).alias("bk"))
        .agg(F.max("doc_id").alias("mx"))
        .select("bk", F.lead("mx").over(Window.orderBy("bk")).alias("nx"))
    )
    assert not _funnels(summ), _funnels(summ)


def test_global_aggregate_still_bounds_with_fixed_ratio_key_upstream(spark):
    """A keys=[] summary downstream of a fixed-ratio groupBy is one row
    — its single-partition exchange must NOT be flagged (the
    privacy_k_anonymity shape)."""
    c = load_tables(spark, SF_DIR)["customer"]
    q = c.groupBy(F.floor(F.col("c_acctbal") / 1000).alias("band")).agg(
        F.count(F.lit(1)).alias("grp")
    )
    df = q.agg(F.min("grp").alias("min_group"), F.count(F.lit(1)).alias("n"))
    assert not _funnels(df), _funnels(df)


def test_flagship_queries_are_scale_safe(spark):
    for name in ("q1_pricing_summary", "dedup_minhash_lsh", "knn_graph_blocked"):
        df = registry.QUERIES[name](spark, SF_DIR)
        assert_scale_safe(df), name


def test_report_formats(spark):
    li = load_tables(spark, SF_DIR)["lineitem"]
    df = li.orderBy("l_extendedprice")
    out = report(df)
    assert "global-sort" in out and out.startswith("warn")
    assert report(li.limit(3)) == ""

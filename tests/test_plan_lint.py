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

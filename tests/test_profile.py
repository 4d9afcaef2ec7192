"""One-pass profiling utilities (operators/profile.py): stats verified
against directly-computed values, single-scan plan shape asserted."""

from __future__ import annotations

from pyspark.sql import functions as F

from fletcher_spark.io import load_tables
from fletcher_spark.operators.profile import key_skew_report, profile
from tests.conftest import SF_DIR


def test_profile_values_match_direct(spark):
    d = load_tables(spark, SF_DIR)["documents"]
    out = {r["column"]: r for r in profile(d).collect()}
    assert set(out) == set(d.columns)

    n = d.count()
    for c in d.columns:
        assert out[c]["n_rows"] == n
        assert out[c]["n_nulls"] == d.filter(F.col(c).isNull()).count()
    # numeric column: exact min/max as strings
    assert out["n_chars"]["min"] == str(d.agg(F.min("n_chars")).collect()[0][0])
    assert out["n_chars"]["max"] == str(d.agg(F.max("n_chars")).collect()[0][0])
    # string column: length stats
    assert out["lang"]["min"] == "2" and out["lang"]["max"] == "2"
    # HLL estimate within rsd ballpark of the exact distinct
    exact = d.select("source").distinct().count()
    assert abs(out["source"]["approx_distinct"] - exact) <= max(2, 0.15 * exact)


def test_profile_is_one_scan_one_aggregate(spark):
    d = load_tables(spark, SF_DIR)["documents"]
    p = profile(d)._jdf.queryExecution().executedPlan().toString()
    assert p.count("Scan parquet") == 1, p
    # the long-form reshape explodes ONE row, never re-reads data
    assert "Exchange SinglePartition" in p  # global aggregate, by design


def test_key_skew_report(spark):
    li = load_tables(spark, SF_DIR)["lineitem"]
    out = key_skew_report(li, "l_returnflag", top=3).collect()
    assert len(out) == 3
    direct = dict(
        li.groupBy("l_returnflag").count().collect()
    )
    total = li.count()
    for r in out:
        assert r["n_rows"] == direct[r["key_value"]]
        assert abs(r["share"] - r["n_rows"] / total) < 1e-4
    # descending and top-k plan (no global sort of all keys)
    assert out[0]["n_rows"] >= out[1]["n_rows"] >= out[2]["n_rows"]
    p = (
        key_skew_report(li, "l_returnflag", top=3)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "TakeOrderedAndProject" in p, p


def test_profile_handles_hostile_column_names(spark):
    # the parsed-SQL rewrite (r13 wave 10) must keep the Column-API
    # form's generality: identifiers with backticks, literals with
    # quotes (ADVICE r13)
    d = spark.createDataFrame(
        [(1, "x"), (2, None)], ["a`b", "it's"]
    )
    out = {r["column"]: r for r in profile(d).collect()}
    assert set(out) == {"a`b", "it's"}
    assert out["a`b"]["n_rows"] == 2 and out["a`b"]["n_nulls"] == 0
    assert out["it's"]["n_nulls"] == 1
    assert out["a`b"]["min"] == "1" and out["a`b"]["max"] == "2"

"""Migration bridge for reference (pandas) users: the pandas API on
Spark (``pyspark.pandas``) runs the reference's accessor idioms
(`s.str.contains`, `fillna`, `value_counts`, groupby-agg) directly on
distributed data, and round-trips into this library's DataFrame
operators.  The reference's own test style (pandas-equivalence,
/root/reference/tests/test_text.py) is applied: same call, compared
against plain pandas on the collected data."""

from __future__ import annotations

import pandas as pd
import pytest

from fletcher_spark.io import load_tables
from tests.conftest import SF_DIR


@pytest.fixture(scope="module")
def psdf(spark):
    import pyspark.pandas as ps

    ps.set_option("compute.ops_on_diff_frames", True)
    d = load_tables(spark, SF_DIR)["documents"]
    yield d.pandas_api()


def test_str_accessor_matches_pandas(spark, psdf):
    got = psdf["text"].str.contains("the").sort_index().to_pandas()
    want = psdf["text"].to_pandas().str.contains("the")
    pd.testing.assert_series_equal(got, want, check_names=False)


def test_value_counts_matches_pandas(spark, psdf):
    got = psdf["lang"].value_counts().to_pandas().sort_index()
    want = psdf["lang"].to_pandas().value_counts().sort_index()
    pd.testing.assert_series_equal(got, want, check_names=False)


def test_groupby_agg_matches_pandas(spark, psdf):
    got = psdf.groupby("source")["n_chars"].mean().to_pandas().sort_index()
    want = psdf[["source", "n_chars"]].to_pandas().groupby("source")["n_chars"].mean().sort_index()
    pd.testing.assert_series_equal(got, want, check_names=False)


def test_bridge_back_to_spark_operators(spark, psdf):
    """ps.DataFrame → Spark DataFrame → library operator, one plan."""
    from fletcher_spark.operators import strings as S

    sdf = psdf.to_spark()
    out = sdf.select("doc_id", S.upper("text").alias("u")).limit(5).collect()
    assert all(r["u"] == r["u"].upper() for r in out if r["u"] is not None)

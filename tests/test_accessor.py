"""Accessor façade tests: fr_str(col).method() must be plan-identical
to the underlying operators (it is a naming layer, not a second
implementation)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from fletcher_spark.accessor import fr_str


@pytest.fixture(scope="module")
def sdf(spark):
    return spark.createDataFrame(
        [("hello spark world",), ("The Quick-Fox",), ("",), (None,)], "s string"
    ).coalesce(1)


def vals(sdf, col):
    return [r[0] for r in sdf.select(col.alias("o")).collect()]


def test_accessor_matches_python(sdf):
    a = fr_str("s")
    assert vals(sdf, a.contains("spark")) == [True, False, False, None]
    assert vals(sdf, a.len()) == [17, 13, 0, None]
    assert vals(sdf, a.slice(0, 5)) == ["hello", "The Q", "", None]
    assert vals(sdf, a.upper()) == ["HELLO SPARK WORLD", "THE QUICK-FOX", "", None]
    assert vals(sdf, a.zfill(20)) == [
        "000hello spark world", "0000000The Quick-Fox", "0" * 20, None
    ]
    assert vals(sdf, a.count("l")) == [3, 0, 0, None]
    assert vals(sdf, a.istitle()) == [False, True, False, None]


def test_accessor_composes_with_dataframe_api(sdf):
    out = (
        sdf.filter(fr_str("s").contains("spark"))
        .select(fr_str("s").split(" ").alias("toks"))
        .collect()
    )
    assert out[0]["toks"] == ["hello", "spark", "world"]


def test_accessor_is_plan_identical_to_operators(sdf):
    from fletcher_spark.operators import strings as S

    import re

    def canon(df):
        # strip per-plan expression ids (#N) before comparing
        return re.sub(r"#\d+", "#x", df._jdf.queryExecution().optimizedPlan().toString())

    via_accessor = sdf.select(fr_str("s").replace("l", "_", n=1).alias("o"))
    via_operator = sdf.select(S.replace("s", "l", "_", n=1).alias("o"))
    assert canon(via_accessor) == canon(via_operator)

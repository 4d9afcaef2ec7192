"""UDF harness tests (SURVEY.md §2.7): Python-parity for the tier-3
functions that have no SQL oracle (wrap/normalize/casefold/swapcase),
plus the apply_binary_str null contract."""

from __future__ import annotations

import textwrap
import unicodedata

import pytest
from pyspark.sql import functions as F

from fletcher_spark.operators import udf as U

CORPUS = [
    "hello world this is a reasonably long line that will wrap at forty chars",
    "short",
    "",
    "ümlaut Straße ß",
    "éclair",  # combining acute: NFC-normalizes to é
    None,
]


@pytest.fixture(scope="module")
def sdf(spark):
    return spark.createDataFrame([(s,) for s in CORPUS], "s string").coalesce(1)


def run(sdf, col):
    return [r[0] for r in sdf.select(col.alias("o")).collect()]


def test_wrap_matches_textwrap(sdf):
    out = run(sdf, U.wrap(F.col("s"), 40))
    exp = [None if s is None else textwrap.wrap(s, 40) for s in CORPUS]
    assert out == exp


def test_normalize_nfc(sdf):
    out = run(sdf, U.normalize(F.col("s"), "NFC"))
    exp = [None if s is None else unicodedata.normalize("NFC", s) for s in CORPUS]
    assert out == exp


def test_casefold(sdf):
    out = run(sdf, U.casefold(F.col("s")))
    exp = [None if s is None else s.casefold() for s in CORPUS]
    assert out == exp  # ß → ss, beyond lower()


def test_swapcase_unicode(sdf):
    out = run(sdf, U.swapcase(F.col("s")))
    exp = [None if s is None else s.swapcase() for s in CORPUS]
    assert out == exp


def test_apply_binary_str_null_merge(spark):
    df = spark.createDataFrame(
        [("abc", "abd"), ("abc", None), (None, "x"), ("", "")], ["a", "b"]
    )
    out = run(df.coalesce(1), U.prefix_length(F.col("a"), F.col("b")))
    assert out == [2, None, None, 0]


def test_grouped_agg_geomean(spark):
    import math

    df = spark.createDataFrame(
        [("a", 2.0), ("a", 8.0), ("b", 3.0), ("b", None)], ["k", "v"]
    )
    from pyspark.sql import functions as F2

    out = {
        r["k"]: r["g"]
        for r in df.groupBy("k").agg(U.geometric_mean(F2.col("v")).alias("g")).collect()
    }
    assert abs(out["a"] - 4.0) < 1e-9
    assert abs(out["b"] - 3.0) < 1e-9


def test_udtf_split_words(spark):
    U.make_split_words_udtf(spark)
    rows = spark.sql(
        "SELECT * FROM split_words('hello spark world')"
    ).collect()
    assert [(r["idx"], r["word"]) for r in rows] == [
        (0, "hello"), (1, "spark"), (2, "world"),
    ]

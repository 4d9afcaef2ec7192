"""explode_histogram (pipeline/textpipe.py) — the in-row token
histogram that replaced tfidf_doc_topk's explode → groupBy(doc, tok)
shuffle (r13 optimization round).  Differential-pinned against the
groupBy form it replaced, plus the edge cases the staged array
arithmetic must survive (empty array, null array, single element,
all-identical, runs at both ends)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from fletcher_spark.pipeline.textpipe import explode_histogram


def _rows(spark, arrays):
    schema = T.StructType(
        [
            T.StructField("id", T.LongType()),
            T.StructField("toks", T.ArrayType(T.StringType())),
        ]
    )
    return spark.createDataFrame(
        [(i, a) for i, a in enumerate(arrays)], schema
    )


CASES = [
    ["a", "b", "a", "c", "b", "a"],
    ["x"],
    [],
    None,
    ["z", "z", "z", "z"],
    ["m", "a", "m", "a", "m"],
    ["0", "00", "0", "000"],
]


def test_matches_explode_groupby_form(spark):
    df = _rows(spark, CASES)
    got = {
        (r["id"], r["tok"], r["cnt"])
        for r in explode_histogram(df, F.col("toks"), ["id"], "tok", "cnt").collect()
    }
    want = {
        (r["id"], r["tok"], r["cnt"])
        for r in (
            df.select("id", F.explode("toks").alias("tok"))
            .groupBy("id", "tok")
            .agg(F.count(F.lit(1)).cast("long").alias("cnt"))
            .collect()
        )
    }
    assert got == want
    # empty and null arrays produce NO rows (explode semantics)
    ids = {r[0] for r in got}
    assert 2 not in ids and 3 not in ids


def test_long_elements_and_counts_exact(spark):
    # bigint elements: the helper must keep the element type
    schema = T.StructType(
        [
            T.StructField("id", T.LongType()),
            T.StructField("v", T.ArrayType(T.LongType())),
        ]
    )
    df = spark.createDataFrame([(1, [7, 7, 7, 2, 2, 9])], schema)
    out = explode_histogram(df, F.col("v"), ["id"], "item", "cnt")
    assert dict((r["item"], r["cnt"]) for r in out.collect()) == {7: 3, 2: 2, 9: 1}
    assert dict(out.dtypes)["item"] == "bigint"
    assert dict(out.dtypes)["cnt"] == "bigint"


@pytest.mark.parametrize("n", [1, 2, 63, 64])
def test_single_run_lengths(spark, n):
    df = _rows(spark, [["t"] * n])
    out = explode_histogram(df, F.col("toks"), ["id"], "tok", "cnt").collect()
    assert len(out) == 1 and out[0]["cnt"] == n

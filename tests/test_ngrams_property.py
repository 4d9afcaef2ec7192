"""Property tests pinning the zip_with n-gram builder and the in-array
mode fold (pipeline/textpipe.py) against pure-Python references.

Both are load-bearing for the r10 100× fixes: ``ngrams`` was rebuilt
as shift-and-concat ``zip_with`` passes (which PAD the shorter side
with NULLs — the trim must be exact), and ``array_mode_count`` replaced
a corpus-wide explode shuffle in text_repetition, so its run-length
fold must agree with a counting dict on every edge: empty arrays,
all-equal arrays, ties, single tokens, and documents shorter than n.
"""

from __future__ import annotations

from collections import Counter

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from fletcher_spark.pipeline import textpipe as T

# tokens drawn from a tiny vocab so duplicates/ties are common; spaces
# excluded by construction (tokens come from a whitespace split)
st_tok = st.text(alphabet="abc", min_size=1, max_size=3)
st_toks = st.lists(st_tok, min_size=0, max_size=12)
st_batch = st.lists(st_toks, min_size=1, max_size=16)

SETTINGS = settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow, HealthCheck.function_scoped_fixture],
)


def _py_ngrams(toks: list[str], n: int) -> list[str]:
    if len(toks) < n:
        return []
    return [" ".join(toks[i : i + n]) for i in range(len(toks) - n + 1)]


@pytest.mark.parametrize("n", [2, 3, 8])
@given(batch=st_batch)
@SETTINGS
def test_ngrams_matches_python(spark, batch, n):
    df = spark.createDataFrame([(i, t) for i, t in enumerate(batch)], "i int, toks array<string>")
    got = {
        r["i"]: r["g"]
        for r in df.select("i", T.ngrams(F.col("toks"), n).alias("g")).collect()
    }
    for i, toks in enumerate(batch):
        assert got[i] == _py_ngrams(toks, n), (toks, n)


@given(batch=st_batch)
@SETTINGS
def test_array_mode_count_matches_counter(spark, batch):
    df = spark.createDataFrame([(i, t) for i, t in enumerate(batch)], "i int, toks array<string>")
    got = {
        r["i"]: r["m"]
        for r in df.select("i", T.array_mode_count(F.col("toks")).alias("m")).collect()
    }
    for i, toks in enumerate(batch):
        exp = max(Counter(toks).values()) if toks else 0
        assert got[i] == exp, toks


@given(batch=st.lists(st.lists(st.integers(-3, 3), max_size=10), min_size=1, max_size=16))
@SETTINGS
def test_array_mode_count_generic_bigint(spark, batch):
    """The fold is type-generic: its accumulator's ``prev`` is a typed
    NULL from ``get(arr, -1)``, not a string cast — pin bigint arrays
    against the same Counter reference."""
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(batch)], "i int, xs array<bigint>"
    )
    got = {
        r["i"]: r["m"]
        for r in df.select("i", T.array_mode_count(F.col("xs")).alias("m")).collect()
    }
    for i, xs in enumerate(batch):
        exp = max(Counter(xs).values()) if xs else 0
        assert got[i] == exp, xs

"""Property-based differential testing vs Python str — the Spark analog
of the reference's hypothesis strategy (/root/reference/tests/
test_text.py:31-33 ``st_text`` + ``_check_str_to_t``): arbitrary
unicode-ish strings with Nones, Spark expression vs pure Python, exact
equality.

Each hypothesis example generates a BATCH of strings evaluated in one
Spark job (per-example jobs would be 100× slower than the kernels under
test); examples are capped to keep the suite interactive.
"""

from __future__ import annotations

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from fletcher_spark.operators import strings as S

# printable-ish unicode incl. whitespace edges and astral-adjacent chars;
# excludes surrogates (invalid in UTF-8 transport)
st_text = st.one_of(
    st.none(),
    st.text(
        alphabet=st.characters(
            codec="utf-8",
            categories=("L", "N", "P", "S", "Z", "Cc"),
        ),
        max_size=24,
    ),
)

st_batch = st.lists(st_text, min_size=1, max_size=24)

SETTINGS = settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow, HealthCheck.function_scoped_fixture],
)


def run_batch(spark, batch, col_fn, py_fn):
    sdf = spark.createDataFrame([(s,) for s in batch], "s string").coalesce(1)
    got = [r[0] for r in sdf.select(col_fn("s").alias("o")).collect()]
    exp = [None if s is None else py_fn(s) for s in batch]
    assert got == exp, f"batch={batch!r}"


@SETTINGS
@given(batch=st_batch)
def test_length_property(spark, batch):
    run_batch(spark, batch, S.length, len)


@SETTINGS
@given(batch=st_batch)
def test_reverse_slice_property(spark, batch):
    run_batch(spark, batch, lambda c: S.slice_codepoints(c, None, None, -1), lambda s: s[::-1])


@SETTINGS
@given(batch=st_batch, start=st.integers(-6, 6), step=st.integers(1, 4))
def test_slice_step_property(spark, batch, start, step):
    run_batch(
        spark,
        batch,
        lambda c: S.slice_codepoints(c, start, None, step),
        lambda s: s[start::step],
    )


@SETTINGS
@given(batch=st_batch, width=st.integers(0, 12))
def test_zfill_property(spark, batch, width):
    run_batch(spark, batch, lambda c: S.zfill(c, width), lambda s: s.zfill(width))


@SETTINGS
@given(batch=st_batch, width=st.integers(0, 12))
def test_center_property(spark, batch, width):
    run_batch(spark, batch, lambda c: S.center(c, width, "*"), lambda s: s.center(width, "*"))


@SETTINGS
@given(batch=st_batch, pat=st.text(alphabet="abA ", min_size=1, max_size=3))
def test_count_literal_property(spark, batch, pat):
    run_batch(spark, batch, lambda c: S.count_occurrences(c, pat), lambda s: s.count(pat))


@SETTINGS
@given(batch=st_batch, pat=st.text(alphabet="ab ", min_size=1, max_size=2))
def test_replace_first_n_property(spark, batch, pat):
    run_batch(
        spark,
        batch,
        lambda c: S.replace(c, pat, "@", n=2),
        lambda s: s.replace(pat, "@", 2),
    )


@SETTINGS
@given(batch=st_batch, chars=st.text(alphabet="ab*+- ", min_size=1, max_size=3))
def test_strip_charset_property(spark, batch, chars):
    run_batch(spark, batch, lambda c: S.strip(c, chars), lambda s: s.strip(chars))

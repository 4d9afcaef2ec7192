"""Differential tests: fletcher_spark.operators.strings vs Python str.

Mirrors the reference's test strategy (pandas-equivalence over curated
example lists + offsets — /root/reference/tests/test_text.py:193-226
``_check_str_to_t``): run the Spark expression and the pure-Python
string method side by side on a fixture corpus and assert equality.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from fletcher_spark.operators import strings as S

# Curated corpus in the spirit of the reference's ``examples`` list
# (/root/reference/fletcher/testing.py:6-33): empties, whitespace edges,
# signs, unicode, mixed case, repeats.
CORPUS = [
    "hello world",
    "",
    " padded  ",
    "\tTabs\tand\nnewlines\n",
    "UPPER lower Mixed",
    "-42",
    "+3.14",
    "0042",
    "ababab",
    "aaa",
    "ü ünïcödé Ünïcödé",
    "†crazy-hyphen-case†",
    "12345",
    "12a45",
    "   ",
    "xyx",
    "a",
    None,
]


@pytest.fixture(scope="module")
def sdf(spark):
    return spark.createDataFrame([(s,) for s in CORPUS], "s string").coalesce(1)


def run(sdf, col):
    return [r[0] for r in sdf.select(col.alias("out")).collect()]


def pyref(fn):
    return [None if s is None else fn(s) for s in CORPUS]


def check(sdf, col, fn):
    assert run(sdf, col) == pyref(fn)


# ---- predicates ----------------------------------------------------------


def test_contains_literal(sdf):
    check(sdf, S.contains("s", "lo"), lambda s: "lo" in s)


def test_contains_empty_pattern(sdf):
    check(sdf, S.contains("s", ""), lambda s: True)


def test_contains_case_insensitive(sdf):
    check(sdf, S.contains("s", "upper", case=False), lambda s: "upper" in s.lower())


def test_contains_regex(sdf):
    check(sdf, S.contains("s", "[0-9]+", regex=True), lambda s: __import__("re").search("[0-9]+", s) is not None)


def test_startswith_endswith(sdf):
    check(sdf, S.startswith("s", "he"), lambda s: s.startswith("he"))
    check(sdf, S.endswith("s", "b"), lambda s: s.endswith("b"))


# ---- counting ------------------------------------------------------------


def test_count_literal(sdf):
    check(sdf, S.count_occurrences("s", "ab"), lambda s: s.count("ab"))


def test_count_empty_pattern(sdf):
    # pandas/reference edge: empty pattern counts len+1
    # (/root/reference/fletcher/algorithms/string.py:178-183)
    check(sdf, S.count_occurrences("s", ""), lambda s: len(s) + 1)


def test_count_regex(sdf):
    import re

    check(sdf, S.count_occurrences("s", "[ab]", regex=True), lambda s: len(re.findall("[ab]", s)))


# ---- replace -------------------------------------------------------------


def test_replace_all(sdf):
    check(sdf, S.replace("s", "ab", "X"), lambda s: s.replace("ab", "X"))


def test_replace_first_n(sdf):
    check(sdf, S.replace("s", "a", "_", n=2), lambda s: s.replace("a", "_", 2))


def test_replace_regex(sdf):
    import re

    check(sdf, S.replace("s", "[0-9]", "#", regex=True), lambda s: re.sub("[0-9]", "#", s))


# ---- strip ---------------------------------------------------------------


def test_strip_default(sdf):
    check(sdf, S.strip("s"), lambda s: s.strip())


def test_strip_charset(sdf):
    check(sdf, S.strip("s", "ax"), lambda s: s.strip("ax"))


def test_lstrip_rstrip(sdf):
    check(sdf, S.lstrip("s"), lambda s: s.lstrip())
    check(sdf, S.rstrip("s"), lambda s: s.rstrip())
    check(sdf, S.lstrip("s", "+-0"), lambda s: s.lstrip("+-0"))
    check(sdf, S.rstrip("s", "b†"), lambda s: s.rstrip("b†"))


# ---- slice / get ---------------------------------------------------------


@pytest.mark.parametrize(
    "start,stop,step",
    [
        (0, None, 1),
        (2, 7, 1),
        (1, None, 2),
        (0, None, 3),
        (-3, None, 1),
        (1, -1, 1),
        (-5, -1, 2),
        (None, None, -1),
        (None, None, -2),
        (8, 2, -2),
        (5, 5, 1),
        (7, 2, 1),
    ],
)
def test_slice_codepoints(sdf, start, stop, step):
    check(sdf, S.slice_codepoints("s", start, stop, step), lambda s: s[slice(start, stop, step)])


def test_get(sdf):
    check(sdf, S.get("s", 1), lambda s: s[1] if len(s) > 1 else "")
    check(sdf, S.get("s", -1), lambda s: s[-1] if len(s) >= 1 else "")


# ---- pad -----------------------------------------------------------------


def test_pad(sdf):
    check(sdf, S.pad("s", 8, "left"), lambda s: s.rjust(8))
    check(sdf, S.pad("s", 8, "right", "*"), lambda s: s.ljust(8, "*"))


def test_center(sdf):
    check(sdf, S.center("s", 9, "*"), lambda s: s.center(9, "*"))


def test_zfill(sdf):
    check(sdf, S.zfill("s", 7), lambda s: s.zfill(7))


# ---- case ----------------------------------------------------------------


def test_case_functions(sdf):
    check(sdf, S.lower("s"), str.lower)
    check(sdf, S.upper("s"), str.upper)
    check(sdf, S.capitalize("s"), str.capitalize)


def test_swapcase_ascii(sdf):
    # ASCII-only contract (unicode ü stays as-is under translate)
    def ascii_swap(s):
        return "".join(
            c.upper() if c.islower() and c.isascii() else c.lower() if c.isupper() and c.isascii() else c
            for c in s
        )

    check(sdf, S.swapcase("s"), ascii_swap)


def test_title_space_words(sdf):
    # documented contract: capitalizes after spaces only
    def space_title(s):
        return " ".join(w[:1].upper() + w[1:].lower() for w in s.split(" "))

    check(sdf, S.title("s"), space_title)


# ---- find ----------------------------------------------------------------


def test_find(sdf):
    check(sdf, S.find("s", "a"), lambda s: s.find("a"))
    check(sdf, S.find("s", "a", start=2), lambda s: s.find("a", 2))
    check(sdf, S.rfind("s", "ab"), lambda s: s.rfind("ab"))


# ---- repeat / translate / split -----------------------------------------


def test_repeat(sdf):
    check(sdf, S.repeat("s", 2), lambda s: s * 2)


def test_translate(sdf):
    check(
        sdf,
        S.translate("s", {"a": "4", "e": "3", "l": None}),
        lambda s: s.translate(str.maketrans({"a": "4", "e": "3", "l": None})),
    )


def test_split_part(sdf):
    check(sdf, S.split_part("s", " ", 1), lambda s: (s.split(" ") + [""])[0] if " " in s else s)


def test_partition(sdf):
    b, m, a = S.partition("s", " ")
    check(sdf, b, lambda s: s.partition(" ")[0])
    check(sdf, m, lambda s: s.partition(" ")[1])
    check(sdf, a, lambda s: s.partition(" ")[2])


def test_rpartition(sdf):
    b, m, a = S.rpartition("s", "a")
    check(sdf, b, lambda s: s.rpartition("a")[0])
    check(sdf, m, lambda s: s.rpartition("a")[1])
    check(sdf, a, lambda s: s.rpartition("a")[2])


# ---- regex extraction ----------------------------------------------------


def test_extract(sdf):
    import re

    def py_extract(s):
        m = re.search(r"([0-9]+)", s)
        return m.group(1) if m else None

    check(sdf, S.extract("s", r"([0-9]+)"), py_extract)


def test_match_fullmatch(sdf):
    import re

    check(sdf, S.match("s", r"[a-z]+"), lambda s: re.match(r"[a-z]+", s) is not None)
    check(sdf, S.fullmatch("s", r"[a-z ]+"), lambda s: re.fullmatch(r"[a-z ]+", s) is not None)


# ---- is-classifications --------------------------------------------------


def test_is_classifications(sdf):
    # ASCII-ish corpus: Java \p{} classes agree with Python here
    check(sdf, S.isalpha("s"), str.isalpha)
    check(sdf, S.isdigit("s"), str.isdigit)
    check(sdf, S.isdecimal("s"), str.isdecimal)
    check(sdf, S.isnumeric("s"), str.isnumeric)
    check(sdf, S.isalnum("s"), str.isalnum)
    check(sdf, S.isspace("s"), str.isspace)
    check(sdf, S.islower("s"), str.islower)
    check(sdf, S.isupper("s"), str.isupper)


def test_cat_null_propagation(spark):
    df = spark.createDataFrame([("a", "b"), ("x", None), (None, "y")], ["a", "b"])
    out = [r[0] for r in df.select(S.cat("a", "b").alias("o")).collect()]
    assert out == ["ab", None, None]


def test_length(sdf):
    check(sdf, S.length("s"), len)

def test_split_rsplit(sdf):
    check(sdf, S.split("s", " ", 1), lambda s: s.split(" ", 1))
    check(sdf, S.rsplit("s", " ", 1), lambda s: s.rsplit(" ", 1))
    check(sdf, S.rsplit("s", "a", 2), lambda s: s.rsplit("a", 2))
    check(sdf, S.split("s", "b"), lambda s: s.split("b"))


def test_index_rindex_null_for_missing(spark):
    """str.index/rindex SQL adaptation: position when present, NULL when
    absent (a distributed job cannot raise row-wise; reference raises —
    documented deviation).  utf8_size counts BYTES, not codepoints."""
    from fletcher_spark.operators import strings as S

    df = spark.createDataFrame(
        [("abcabc",), ("xyz",), ("café",)], "s string"
    )
    rows = df.select(
        S.index("s", "bc").alias("i"),
        S.rindex("s", "bc").alias("ri"),
        S.utf8_size("s").alias("b"),
        F.length("s").alias("cp"),
    ).collect()
    assert (rows[0]["i"], rows[0]["ri"]) == (1, 4)
    assert rows[1]["i"] is None and rows[1]["ri"] is None
    assert rows[2]["b"] == 5 and rows[2]["cp"] == 4  # é is 2 bytes

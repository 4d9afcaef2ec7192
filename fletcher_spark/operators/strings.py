"""String compute surface (SURVEY.md §2.6) — the reference's centerpiece.

The reference implements three tiers (fletcher/string_array.py:312-330):
native Numba kernels over raw Arrow buffers, pyarrow.compute C++ kernels,
and a pandas object fallback.  On Spark the tiering collapses to:

1. **builtin** — a Catalyst expression (`pyspark.sql.functions`), runs
   inside whole-stage codegen.  This covers almost everything, including
   several functions the reference needed hand-written kernels for
   (contains: fletcher/algorithms/string.py:240-328, replace: :331-542,
   strip: :545-684, startswith/endswith: :687-724, cat: :94-118).
2. **regexp-composed** — still JVM-side codegen, built from
   `regexp_*` / `split` / `reverse` combinations (count: string.py:163-237,
   slice-with-step: string.py:727-908, replace-first-n, is-classifications
   fletcher/string_mixin.py:38-91).
3. **pandas_udf** — Arrow-vectorized Python, only where JVM semantics
   genuinely cannot match Python's (textwrap.wrap, unicodedata.normalize);
   see fletcher_spark/operators/udf.py.

Every function is a Column→Column expression: it composes with filters,
joins, and aggregates, and Catalyst pushes the whole pipeline into one
codegen stage — there is no per-function materialization like the
reference's chunk-at-a-time kernel dispatch.

Unicode notes (pinned deltas, cf. the reference's hypothesis exclusion
lists at /root/reference/tests/test_text.py:29-69):

* is-classifications use Java/RE2-shared Unicode property classes
  (``\\p{L}``, ``\\p{Nd}`` …), which agree with Python ``str.isalpha`` /
  ``isdigit`` on the common cases but diverge on exotica (e.g. Python
  ``isdecimal`` vs ``isdigit`` on superscripts).  The regexes are the
  documented semantics.
* ``swapcase`` is ASCII-complete via ``translate`` (JVM-side); full
  Unicode swapcase would need the pandas_udf tier.
* ``title``/``capitalize`` follow Python semantics (capitalize after any
  non-letter) via regex, not ``initcap`` (which only splits on spaces).
"""

from __future__ import annotations

import string as _string

from pyspark.sql import Column
from pyspark.sql import functions as F

__all__ = [
    "cat",
    "contains",
    "startswith",
    "endswith",
    "count_occurrences",
    "replace",
    "strip",
    "lstrip",
    "rstrip",
    "slice_codepoints",
    "get",
    "pad",
    "center",
    "zfill",
    "length",
    "lower",
    "upper",
    "capitalize",
    "title",
    "swapcase",
    "casefold",
    "find",
    "rfind",
    "repeat",
    "translate",
    "split_part",
    "partition",
    "rpartition",
    "extract",
    "match",
    "fullmatch",
    "isalpha",
    "isdigit",
    "isdecimal",
    "isnumeric",
    "isalnum",
    "isspace",
    "islower",
    "isupper",
    "istitle",
]


def _c(col: Column | str) -> Column:
    return F.col(col) if isinstance(col, str) else col


# --------------------------------------------------------------------------
# concat / predicates / counting  (tier: builtin)
# --------------------------------------------------------------------------


def cat(a: Column | str, b: Column | str) -> Column:
    """Element-wise concat, null if either side null.

    Reference: ``_text_cat`` (fletcher/algorithms/string.py:94-118) — a
    merge of two offset/data buffer pairs; ``F.concat`` has identical
    null-propagating semantics and runs in codegen.
    """
    return F.concat(_c(a), _c(b))


def contains(col: Column | str, pat: str, case: bool = True, regex: bool = False) -> Column:
    """Substring / regex containment per row.

    Reference: KMP kernel ``_text_contains_case_sensitive``
    (fletcher/algorithms/string.py:240-328).  Spark's ``Contains`` uses
    JDK indexOf inside codegen — same O(n·m) worst case but no Python
    boundary; regex goes through ``RLIKE`` (unanchored).
    Empty literal pattern → True for every non-null row (reference:
    ``all_true_like`` fast path, fletcher/string_array.py:404-408).
    """
    c = _c(col)
    if regex:
        return c.rlike(pat) if case else F.upper(c).rlike(pat.upper())
    if pat == "":
        return F.when(c.isNotNull(), F.lit(True))
    if not case:
        return F.upper(c).contains(pat.upper())
    return c.contains(pat)


def startswith(col: Column | str, pat: str) -> Column:
    """Byte-prefix test (fletcher/algorithms/string.py:687-705)."""
    return _c(col).startswith(pat)


def endswith(col: Column | str, pat: str) -> Column:
    """Byte-suffix test (fletcher/algorithms/string.py:708-724)."""
    return _c(col).endswith(pat)


def count_occurrences(col: Column | str, pat: str, regex: bool = False) -> Column:
    """Non-overlapping occurrence count per row.

    Reference: KMP counting kernel (fletcher/algorithms/string.py:163-237)
    with the pandas edge case *empty pattern → len + 1*.  Builtin path:
    ``regexp_count`` with the literal quoted via ``\\Q…\\E``.
    """
    c = _c(col)
    if not regex and pat == "":
        return F.length(c) + F.lit(1)
    pattern = pat if regex else "\\Q" + pat + "\\E"
    return F.regexp_count(c, F.lit(pattern))


# --------------------------------------------------------------------------
# replace  (tier: builtin / regexp-composed)
# --------------------------------------------------------------------------


def replace(col: Column | str, pat: str, repl: str, n: int = -1, regex: bool = False) -> Column:
    """Replace the first ``n`` occurrences (``n=-1`` → all).

    Reference: two-pass KMP kernel (fletcher/algorithms/string.py:331-542).
    Spark mapping:

    * all, literal   → ``F.replace`` (codegen)
    * all, regex     → ``F.regexp_replace``
    * first-n, literal → ``array_join(split(col, quoted, n+1), repl)`` —
      ``split`` with a limit keeps the un-split remainder in the last
      array slot, so re-joining with ``repl`` rewrites exactly the first
      n separators.  Entirely JVM-side; the reference needed a bespoke
      kernel for the same bounded-n semantics.
    """
    c = _c(col)
    if n == -1:
        if regex:
            return F.regexp_replace(c, pat, repl)
        return F.replace(c, F.lit(pat), F.lit(repl))
    pattern = pat if regex else "\\Q" + pat + "\\E"
    return F.array_join(F.split(c, pattern, n + 1), repl)


# --------------------------------------------------------------------------
# strip family  (tier: builtin)
# --------------------------------------------------------------------------


#: Unicode whitespace the reference's strip kernel removes beyond ASCII
#: (fletcher/algorithms/string.py:552-566) — as a Java-regex char class
#: body (\\s plus NBSP, ogham, en-quad..hair-space, LS, PS, NNBSP, MMSP,
#: ideographic space).
_UNICODE_WS = "\\s\u00a0\u1680\u2000-\u200a\u2028\u2029\u202f\u205f\u3000"


def _charset_class(chars: str) -> str:
    """Regex char class matching any char in ``chars`` (escaped)."""
    return "[" + "".join("\\" + ch if not ch.isalnum() else ch for ch in chars) + "]"


def strip(col: Column | str, to_strip: str | None = None) -> Column:
    """Strip a char-set from both ends (default: Unicode whitespace).

    Reference: manual UTF-8 decode + curated Unicode space list
    (fletcher/algorithms/string.py:545-684).  ``btrim`` takes an explicit
    char-set; the default whitespace set needs a regex pass because
    ``trim`` only removes ASCII spaces.
    """
    c = _c(col)
    if to_strip is None:
        cls = f"[{_UNICODE_WS}]+"
        return F.regexp_replace(c, f"^{cls}|{cls}$", "")
    return F.btrim(c, F.lit(to_strip))


def lstrip(col: Column | str, to_strip: str | None = None) -> Column:
    c = _c(col)
    if to_strip is None:
        return F.regexp_replace(c, f"^[{_UNICODE_WS}]+", "")
    return F.regexp_replace(c, "^" + _charset_class(to_strip) + "+", "")


def rstrip(col: Column | str, to_strip: str | None = None) -> Column:
    c = _c(col)
    if to_strip is None:
        return F.regexp_replace(c, f"[{_UNICODE_WS}]+$", "")
    return F.regexp_replace(c, _charset_class(to_strip) + "+$", "")


# --------------------------------------------------------------------------
# slice / element access  (tier: builtin + regexp-composed)
# --------------------------------------------------------------------------


def slice_codepoints(
    col: Column | str,
    start: int = 0,
    stop: int | None = None,
    step: int = 1,
) -> Column:
    """Per-row ``s[start:stop:step]`` by codepoint, Python semantics.

    Reference: three Numba kernels incl. negative-step generic path
    (fletcher/algorithms/string.py:727-908).  Spark decomposition —
    all JVM-side, no UDF:

    1. resolve negative ``start``/``stop`` against ``length(s)`` with
       Python clamping;
    2. take the contiguous range with ``substring``;
    3. ``step > 1`` → keep every step-th char with one regex:
       ``regexp_replace(x, '(.).{0,step-1}', '$1')`` — the group keeps a
       char, the greedy ``.{0,k-1}`` swallows up to k-1 following chars
       (fewer at the tail), exactly Python's stride;
    4. ``step < 0`` → ``reverse`` then the positive-step rule.

    ``.`` in Java regex matches a full codepoint (not a byte), so this
    is codepoint-correct like the reference's UTF-8 walker.
    """
    c = _c(col)
    n = F.length(c)

    if step == 0:
        raise ValueError("slice step cannot be zero")

    def resolve(idx: int | None, default_neg: Column, default_pos: Column) -> Column:
        if idx is None:
            return default_pos if step > 0 else default_neg
        if idx < 0:
            return F.greatest(n + F.lit(idx), F.lit(0) if step > 0 else F.lit(-1))
        return F.least(F.lit(idx), n if step > 0 else n - 1)

    if step > 0:
        lo = resolve(start, None, F.lit(0)) if start is not None else F.lit(0)
        hi = resolve(stop, None, n) if stop is not None else n
        # substring is 1-based; empty when hi<=lo
        base = F.substring(c, lo + 1, F.greatest(hi - lo, F.lit(0)))
        if step == 1:
            return base
        return F.regexp_replace(base, "(?s)(.).{0,%d}" % (step - 1), "$1")
    # negative step: python s[a:b:-k] walks from a down to b (exclusive)
    lo = resolve(start, n - 1, None) if start is not None else n - 1
    hi = resolve(stop, F.lit(-1), None) if stop is not None else F.lit(-1)
    # chars at positions (hi, lo] reversed == reverse(substring(hi+1 .. lo))
    base = F.reverse(F.substring(c, hi + 2, F.greatest(lo - hi, F.lit(0))))
    if step == -1:
        return base
    return F.regexp_replace(base, "(?s)(.).{0,%d}" % (-step - 1), "$1")


def get(col: Column | str, i: int) -> Column:
    """``s[i]`` per row — empty-out-of-bounds like pandas ``.str.get``."""
    if i >= 0:
        return F.substring(_c(col), i + 1, 1)
    c = _c(col)
    return F.when(
        c.isNotNull(),
        F.when(F.length(c) + i >= 0, F.substring(c, F.length(c) + F.lit(i) + 1, 1)).otherwise(
            F.lit("")
        ),
    )


# --------------------------------------------------------------------------
# pad family  (tier: builtin)
# --------------------------------------------------------------------------


def pad(col: Column | str, width: int, side: str = "left", fillchar: str = " ") -> Column:
    """lpad/rpad; pandas ``.str.pad`` never truncates, so guard on length
    (Spark's ``lpad`` truncates to ``len``)."""
    c = _c(col)
    if side == "left":
        padded = F.lpad(c, width, fillchar)
    elif side == "right":
        padded = F.rpad(c, width, fillchar)
    else:
        raise ValueError(f"side must be left/right, got {side}")
    return F.when(F.length(c) >= width, c).otherwise(padded)


def center(col: Column | str, width: int, fillchar: str = " ") -> Column:
    """Both-sided pad with CPython's exact left-margin rule
    ``left = marg // 2 + (marg & width & 1)``."""
    c = _c(col)
    marg = F.greatest(F.lit(width) - F.length(c), F.lit(0))
    left = (marg / 2).cast("int") + marg.bitwiseAND(F.lit(width)).bitwiseAND(F.lit(1))
    padded = F.rpad(F.lpad(c, (F.length(c) + left).cast("int"), fillchar), width, fillchar)
    return F.when(F.length(c) >= width, c).otherwise(padded)


def zfill(col: Column | str, width: int) -> Column:
    """Left-pad with '0', Python sign handling: the sign stays leftmost.

    Reference: pandas fallback (fletcher/string_array.py:480-482); plain
    ``lpad(c, w, '0')`` would produce ``00-42`` — the sign split keeps
    exact ``str.zfill`` semantics, still codegen.
    """
    c = _c(col)
    sign = F.substring(c, 1, 1)
    has_sign = sign.isin("-", "+")
    body = F.when(has_sign, F.substring(c, 2, F.length(c))).otherwise(c)
    sign_out = F.when(has_sign, sign).otherwise(F.lit(""))
    filled = F.concat(sign_out, F.lpad(body, width - 1, "0"))
    unfilled = F.concat(sign_out, body)
    return F.when(F.length(c) >= width, c).otherwise(
        F.when(has_sign, filled).otherwise(F.lpad(c, width, "0"))
    )


# --------------------------------------------------------------------------
# case / length  (tier: builtin + regexp-composed)
# --------------------------------------------------------------------------


def length(col: Column | str) -> Column:
    """Codepoint length (matches Python ``len`` and the reference)."""
    return F.length(_c(col))


def lower(col: Column | str) -> Column:
    return F.lower(_c(col))


def upper(col: Column | str) -> Column:
    return F.upper(_c(col))


def casefold(col: Column | str) -> Column:
    """ASCII-equivalent of lower; full Unicode casefold (ß→ss) would
    need the pandas_udf tier — documented delta."""
    return F.lower(_c(col))


def capitalize(col: Column | str) -> Column:
    """First char upper, rest lower — Python semantics (whole string,
    not per word like ``initcap``)."""
    c = _c(col)
    return F.concat(F.upper(F.substring(c, 1, 1)), F.lower(F.substring(c, 2, F.length(c))))


def title(col: Column | str) -> Column:
    """Python-flavored ``str.title``, pure Catalyst: split on spaces,
    capitalize each token, re-join.  Matches Python for space-separated
    text (the corpus); hyphen-case deltas are documented (Python
    capitalizes after '-', this does not)."""
    c = _c(col)
    return F.array_join(
        F.transform(
            F.split(c, " ", -1),
            lambda w: F.concat(
                F.upper(F.substring(w, 1, 1)), F.lower(F.substring(w, 2, F.length(w)))
            ),
        ),
        " ",
    )


def swapcase(col: Column | str) -> Column:
    """ASCII swapcase via one ``translate`` (JVM-side).

    Reference tier: pandas fallback.  Full Unicode swapcase needs the
    pandas_udf tier; ASCII covers the reference's test corpus.
    """
    lower_a = _string.ascii_lowercase
    upper_a = _string.ascii_uppercase
    return F.translate(_c(col), lower_a + upper_a, upper_a + lower_a)


# --------------------------------------------------------------------------
# find / index  (tier: builtin)
# --------------------------------------------------------------------------


def find(col: Column | str, sub: str, start: int = 0) -> Column:
    """Python ``str.find``: 0-based first index, -1 if absent.

    ``locate`` is 1-based with a start offset; subtract 1.
    """
    return F.locate(sub, _c(col), start + 1) - 1


def rfind(col: Column | str, sub: str) -> Column:
    """Python ``str.rfind`` via the reverse trick (no right-to-left scan
    builtin): rfind = len(s) - len(sub) - find(reverse(s), reverse(sub))."""
    c = _c(col)
    rev_pos = F.locate(sub[::-1], F.reverse(c)) - 1
    return F.when(rev_pos < 0, F.lit(-1)).otherwise(F.length(c) - F.lit(len(sub)) - rev_pos)


def index(col: Column | str, sub: str, start: int = 0) -> Column:
    """Python ``str.index`` semantics, SQL-adapted: like :func:`find`
    but a MISSING substring yields NULL instead of raising — a row-wise
    exception cannot abort a distributed job, so absence is encoded in
    the result (documented deviation; reference pandas fallback raises,
    /root/reference/tests/test_text.py test_index)."""
    pos = find(col, sub, start)
    return F.when(pos < 0, F.lit(None)).otherwise(pos)


def rindex(col: Column | str, sub: str) -> Column:
    """Python ``str.rindex`` with the same NULL-for-missing adaptation
    as :func:`index` (reference test_text.py test_rindex)."""
    pos = rfind(col, sub)
    return F.when(pos < 0, F.lit(None)).otherwise(pos)


def utf8_size(col: Column | str) -> Column:
    """Byte length of the UTF-8 encoding — the reference's
    ``utf8_size`` kernel (fletcher numba strings; test_text.py
    test_utf8_size).  ``octet_length`` vs ``length``: bytes vs
    codepoints."""
    return F.octet_length(_c(col))


# --------------------------------------------------------------------------
# repeat / translate / split family  (tier: builtin)
# --------------------------------------------------------------------------


def repeat(col: Column | str, n: int) -> Column:
    return F.repeat(_c(col), n)


def translate(col: Column | str, mapping: dict[str, str]) -> Column:
    """Char→char mapping via ``F.translate``; chars mapped to None are
    deleted (Spark: shorter replace string drops them)."""
    src = "".join(mapping.keys())
    dst = "".join(v if v is not None else "" for v in mapping.values())
    return F.translate(_c(col), src, dst)


def split_part(col: Column | str, delim: str, part: int) -> Column:
    """1-based field extraction (negative counts from the end)."""
    return F.split_part(_c(col), F.lit(delim), F.lit(part))


def partition(col: Column | str, sep: str) -> tuple[Column, Column, Column]:
    """Python ``str.partition`` → (before, sep-or-empty, after)."""
    c = _c(col)
    pos = F.locate(sep, c)
    found = pos > 0
    nn = c.isNotNull()
    before = F.when(found, F.substring(c, 1, pos - 1)).otherwise(c)
    mid = F.when(nn, F.when(found, F.lit(sep)).otherwise(F.lit("")))
    after = F.when(nn, F.when(found, F.substring(c, pos + len(sep), F.length(c))).otherwise(F.lit("")))
    return before, mid, after


def rpartition(col: Column | str, sep: str) -> tuple[Column, Column, Column]:
    """Python ``str.rpartition`` via the reverse trick."""
    c = _c(col)
    rev_pos = F.locate(sep[::-1], F.reverse(c))
    found = rev_pos > 0
    nn = c.isNotNull()
    # position of the LAST occurrence (1-based start)
    pos = F.length(c) - rev_pos - F.lit(len(sep)) + 2
    before = F.when(nn, F.when(found, F.substring(c, 1, pos - 1)).otherwise(F.lit("")))
    mid = F.when(nn, F.when(found, F.lit(sep)).otherwise(F.lit("")))
    after = F.when(found, F.substring(c, pos + len(sep), F.length(c))).otherwise(c)
    return before, mid, after


# --------------------------------------------------------------------------
# regex extraction  (tier: builtin)
# --------------------------------------------------------------------------


def extract(col: Column | str, pat: str, group: int = 1) -> Column:
    """First-match group extraction; NULL when no match (pandas NaN).

    Spark's ``regexp_extract`` returns '' on no-match — wrap to NULL for
    pandas parity (fletcher test: /root/reference/tests/test_text.py:458).
    """
    c = _c(col)
    return F.when(c.rlike(pat), F.regexp_extract(c, pat, group))


def match(col: Column | str, pat: str) -> Column:
    """pandas ``.str.match``: does the regex match at the START."""
    return _c(col).rlike("^(?:" + pat + ")")


def fullmatch(col: Column | str, pat: str) -> Column:
    """pandas ``.str.fullmatch``: the regex must consume the whole row."""
    return _c(col).rlike("^(?:" + pat + ")$")


# --------------------------------------------------------------------------
# is-classifications  (tier: regexp-composed)
# --------------------------------------------------------------------------
# Reference: pc.utf8_is_* via ObjectStringArrayMixin hooks
# (fletcher/string_mixin.py:38-91).  Unicode property classes below are
# supported by both Java regex and RE2, so the DuckDB oracle can run the
# *same* pattern — parity by construction.  Python-semantics note: empty
# string → False for all (regexes require ≥1 char), matching Python.

_IS_PATTERNS = {
    "isalpha": r"^\p{L}+$",
    "isdigit": r"^\p{Nd}+$",
    "isdecimal": r"^\p{Nd}+$",
    "isnumeric": r"^\p{N}+$",
    "isalnum": r"^[\p{L}\p{N}]+$",
    "isspace": r"^\s+$",
}


def isalpha(col: Column | str) -> Column:
    return _c(col).rlike(_IS_PATTERNS["isalpha"])


def isdigit(col: Column | str) -> Column:
    return _c(col).rlike(_IS_PATTERNS["isdigit"])


def isdecimal(col: Column | str) -> Column:
    return _c(col).rlike(_IS_PATTERNS["isdecimal"])


def isnumeric(col: Column | str) -> Column:
    return _c(col).rlike(_IS_PATTERNS["isnumeric"])


def isalnum(col: Column | str) -> Column:
    return _c(col).rlike(_IS_PATTERNS["isalnum"])


def isspace(col: Column | str) -> Column:
    return _c(col).rlike(_IS_PATTERNS["isspace"])


def islower(col: Column | str) -> Column:
    """At least one lowercase letter and no uppercase (Python rule)."""
    c = _c(col)
    return c.rlike(r"\p{Ll}") & ~c.rlike(r"\p{Lu}")


def isupper(col: Column | str) -> Column:
    c = _c(col)
    return c.rlike(r"\p{Lu}") & ~c.rlike(r"\p{Ll}")


def istitle(col: Column | str) -> Column:
    """Every letter-run starts uppercase then continues lowercase, runs
    separated by non-letters, ≥1 cased char — regex approximation of
    Python ``istitle`` (consecutive uppercase rejected, e.g. 'WORLD')."""
    c = _c(col)
    return c.rlike(r"^[^\p{L}]*\p{Lu}\p{Ll}*(?:[^\p{L}]+\p{Lu}\p{Ll}*)*[^\p{L}]*$")


def split(col: Column | str, sep: str, maxsplit: int = -1) -> Column:
    """Python ``str.split(sep, maxsplit)`` → array<string> (split from
    the LEFT; remainder stays joined in the last element)."""
    return F.split(_c(col), "\\Q" + sep + "\\E", maxsplit + 1 if maxsplit >= 0 else -1)


def rsplit(col: Column | str, sep: str, maxsplit: int = -1) -> Column:
    """Python ``str.rsplit`` via the reverse trick: reverse the string,
    left-split on the reversed separator with the same limit, then
    reverse both the array order and each element — pure Catalyst
    (pandas fallback tier in the reference,
    /root/reference/tests/test_text.py:693)."""
    if maxsplit < 0:
        return split(col, sep, -1)
    rev = F.reverse(_c(col))
    parts = F.split(rev, "\\Q" + sep[::-1] + "\\E", maxsplit + 1)
    return F.reverse(F.transform(parts, F.reverse))

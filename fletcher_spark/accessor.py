"""``fr_str``-style accessor façade (reference API parity).

The reference exposes its string surface through pandas accessors —
``series.fr_str.contains(...)`` / ``series.fr_strx`` (accelerated-only;
fletcher/string_array.py:312-512) and ``.text`` — so a user ports code
by swapping the accessor root.  Here the same method names hang off a
Column wrapper::

    from fletcher_spark.accessor import fr_str

    df.select(fr_str("text").contains("spark").alias("hit"))
    df.filter(fr_str(F.col("text")).startswith("the"))

Every method returns a plain :class:`pyspark.sql.Column`, so accessor
calls compose with the whole DataFrame API and cost nothing at plan
time — this is a *naming* façade over ``operators/strings.py`` (JVM
tiers) and ``operators/udf.py`` (Python tier), not a parallel
implementation.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

from fletcher_spark.operators import strings as S
from fletcher_spark.operators import udf as U


class FrStr:
    """String accessor over one column; method set mirrors the
    reference's ``.fr_str`` (pandas ``.str``) surface."""

    def __init__(self, col: Column | str):
        self._c = F.col(col) if isinstance(col, str) else col

    # -- predicates --------------------------------------------------------
    def contains(self, pat: str, case: bool = True, regex: bool = False) -> Column:
        return S.contains(self._c, pat, case=case, regex=regex)

    def startswith(self, pat: str) -> Column:
        return S.startswith(self._c, pat)

    def endswith(self, pat: str) -> Column:
        return S.endswith(self._c, pat)

    def match(self, pat: str) -> Column:
        return S.match(self._c, pat)

    def fullmatch(self, pat: str) -> Column:
        return S.fullmatch(self._c, pat)

    # -- counting / search -------------------------------------------------
    def count(self, pat: str, regex: bool = False) -> Column:
        return S.count_occurrences(self._c, pat, regex=regex)

    def find(self, sub: str, start: int = 0) -> Column:
        return S.find(self._c, sub, start)

    def rfind(self, sub: str) -> Column:
        return S.rfind(self._c, sub)

    def index(self, sub: str, start: int = 0) -> Column:
        return S.index(self._c, sub, start)

    def rindex(self, sub: str) -> Column:
        return S.rindex(self._c, sub)

    def utf8_size(self) -> Column:
        return S.utf8_size(self._c)

    def len(self) -> Column:
        return S.length(self._c)

    # -- transforms --------------------------------------------------------
    def cat(self, other: Column | str) -> Column:
        return S.cat(self._c, other)

    def replace(self, pat: str, repl: str, n: int = -1, regex: bool = False) -> Column:
        return S.replace(self._c, pat, repl, n=n, regex=regex)

    def strip(self, to_strip: str | None = None) -> Column:
        return S.strip(self._c, to_strip)

    def lstrip(self, to_strip: str | None = None) -> Column:
        return S.lstrip(self._c, to_strip)

    def rstrip(self, to_strip: str | None = None) -> Column:
        return S.rstrip(self._c, to_strip)

    def slice(self, start: int = 0, stop: int | None = None, step: int = 1) -> Column:
        return S.slice_codepoints(self._c, start, stop, step)

    def get(self, i: int) -> Column:
        return S.get(self._c, i)

    def pad(self, width: int, side: str = "left", fillchar: str = " ") -> Column:
        return S.pad(self._c, width, side, fillchar)

    def ljust(self, width: int, fillchar: str = " ") -> Column:
        return S.pad(self._c, width, "right", fillchar)

    def rjust(self, width: int, fillchar: str = " ") -> Column:
        return S.pad(self._c, width, "left", fillchar)

    def center(self, width: int, fillchar: str = " ") -> Column:
        return S.center(self._c, width, fillchar)

    def zfill(self, width: int) -> Column:
        return S.zfill(self._c, width)

    def lower(self) -> Column:
        return S.lower(self._c)

    def upper(self) -> Column:
        return S.upper(self._c)

    def capitalize(self) -> Column:
        return S.capitalize(self._c)

    def title(self) -> Column:
        return S.title(self._c)

    def swapcase(self) -> Column:
        return S.swapcase(self._c)

    def casefold(self) -> Column:
        return S.casefold(self._c)

    def repeat(self, n: int) -> Column:
        return S.repeat(self._c, n)

    def translate(self, mapping: dict[str, str]) -> Column:
        return S.translate(self._c, mapping)

    # -- split family ------------------------------------------------------
    def split(self, sep: str, maxsplit: int = -1) -> Column:
        return S.split(self._c, sep, maxsplit)

    def rsplit(self, sep: str, maxsplit: int = -1) -> Column:
        return S.rsplit(self._c, sep, maxsplit)

    def split_part(self, delim: str, part: int) -> Column:
        return S.split_part(self._c, delim, part)

    def partition(self, sep: str) -> tuple[Column, Column, Column]:
        return S.partition(self._c, sep)

    def rpartition(self, sep: str) -> tuple[Column, Column, Column]:
        return S.rpartition(self._c, sep)

    # -- regex extraction --------------------------------------------------
    def extract(self, pat: str, group: int = 1) -> Column:
        return S.extract(self._c, pat, group)

    def findall(self, pat: str) -> Column:
        return F.regexp_extract_all(self._c, F.lit(pat), 0)

    # -- classifications ---------------------------------------------------
    def isalpha(self) -> Column:
        return S.isalpha(self._c)

    def isdigit(self) -> Column:
        return S.isdigit(self._c)

    def isdecimal(self) -> Column:
        return S.isdecimal(self._c)

    def isnumeric(self) -> Column:
        return S.isnumeric(self._c)

    def isalnum(self) -> Column:
        return S.isalnum(self._c)

    def isspace(self) -> Column:
        return S.isspace(self._c)

    def islower(self) -> Column:
        return S.islower(self._c)

    def isupper(self) -> Column:
        return S.isupper(self._c)

    def istitle(self) -> Column:
        return S.istitle(self._c)

    # -- Python-semantics tier (Arrow-batched pandas_udf) ------------------
    def wrap(self, width: int) -> Column:
        return U.wrap(self._c, width)

    def normalize(self, form: str = "NFC") -> Column:
        return U.normalize(self._c, form)


def fr_str(col: Column | str) -> FrStr:
    """Accessor constructor — the ``series.fr_str`` analog."""
    return FrStr(col)

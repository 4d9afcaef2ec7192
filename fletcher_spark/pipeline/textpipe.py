"""Text-analysis operators for LLM training-data pipelines: tokenize,
n-grams, per-document statistics, quality scoring, language-ID
heuristics, and content fingerprinting.

Everything is a Catalyst expression over a token array (split + array
higher-order functions) — per-document compute is map-only and the only
shuffles are explicit corpus-level aggregations (n-gram counts).  The
reference has no pipeline layer; these build on its string surface
(SURVEY.md §2.6) the way a curation pipeline would.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

__all__ = [
    "tokens",
    "ngrams",
    "type_token_ratio",
    "stopword_ratio",
    "avg_token_len",
    "quality_score",
    "langid_scores",
    "fingerprint",
]

#: tiny per-language stopword lists for the n-gram/stopword heuristic
#: language-ID (real pipelines plug fastText-style models in the same
#: shape — a per-language score column + argmax)
STOPWORDS = {
    "en": ["the", "a", "of", "and"],
    "de": ["der", "die", "und", "das"],
    "es": ["el", "la", "de", "y"],
}


def tokens(text: Column | str) -> Column:
    """Whitespace tokenization (the corpus contract; swap the pattern
    for a BPE-ish regex where needed)."""
    c = F.col(text) if isinstance(text, str) else text
    return F.split(c, r"\s+", -1)


def ngrams(toks: Column, n: int = 2) -> Column:
    """Word n-grams as space-joined strings (empty array when the doc is
    shorter than ``n``).

    Built by shift-and-concat: ``zip_with`` the array against its own
    k-shifted tails, concatenating one token per step — n-1 linear
    passes of cheap string concats.  ~2× faster than the
    ``sequence → slice → array_join`` form it replaced (3.9 s vs 7.4 s
    per bigram pass over 500 k docs at the r10 100× probe), because
    each element is one concat instead of a fresh slice+join.
    ``zip_with`` pads the shorter side with NULLs, so the result is
    trimmed to the exact n-gram count; output is bit-identical to the
    old builder (asserted over sf0.1 before the swap).
    """
    cnt = F.size(toks)
    g = toks
    for k in range(1, n):
        g = F.zip_with(
            g, F.slice(toks, k + 1, cnt), lambda a, b: F.concat(a, F.lit(" "), b)
        )
    g = F.slice(g, 1, cnt - (n - 1))
    return F.when(cnt >= n, g).otherwise(F.array().cast("array<string>"))


def array_mode_count(arr: Column) -> Column:
    """Count of the most frequent element of an array, computed entirely
    in-array: sort, then a single ``aggregate`` pass tracking the current
    run length and the best run seen (codegen-friendly, no explode).

    This is the scale-critical form of a per-row mode: the explode →
    groupBy(row, elem) → groupBy(row) formulation shuffles one row per
    (row, element) pair — ~|rows|×|elements| rows — for a statistic that
    never leaves the row.  Returns 0 for an empty array.

    Works for any element type: the accumulator's ``prev`` field is a
    typed NULL derived from the input (``get(arr, -1)`` — out-of-range,
    so always NULL, never an ANSI error), not a hard-coded string cast,
    so the ``eqNullSafe`` run comparison uses the array's own element
    type (tests/test_ngrams_property.py pins string and bigint arrays).
    """
    run_inc = lambda acc, x: (  # noqa: E731 — local fold step
        F.when(acc["prev"].eqNullSafe(x), acc["run"] + 1).otherwise(F.lit(1))
    )
    return F.aggregate(
        F.array_sort(arr),
        F.struct(
            F.get(arr, F.lit(-1)).alias("prev"),
            F.lit(0).alias("run"),
            F.lit(0).alias("best"),
        ),
        lambda acc, x: F.struct(
            x.alias("prev"),
            run_inc(acc, x).alias("run"),
            F.greatest(acc["best"], run_inc(acc, x)).alias("best"),
        ),
        lambda acc: acc["best"],
    )


def explode_histogram(df, arr: Column, keys: list[str], item: str = "item", cnt: str = "cnt"):
    """Per-row element histogram, exploded to one ``(keys..., item,
    cnt bigint)`` row per DISTINCT element — the generalization of
    :func:`array_mode_count` (same scale rationale: a per-row
    frequency never needs to leave the row, so explode →
    groupBy(row, elem) shuffles |rows|×|elements| rows for nothing).
    Sort, mark run STARTS (positions whose element differs null-safely
    from their predecessor), then each run's count is the gap to the
    next start.

    DataFrame-level ON PURPOSE: every intermediate (sorted array,
    start positions) is staged as its own projection attribute,
    referenced more than once downstream so CollapseProject keeps it
    staged.  A pure-Column formulation re-evaluates the un-staged
    ``array_sort`` INSIDE each lambda invocation (Catalyst does not
    CSE inside higher-order-function lambdas — the
    text_boilerplate_ratio staging note), turning the histogram
    O(n²·log n) per row: measured 45 s vs 0.3 s over sf0.1's 5k docs
    before this staging (r13).

    Null array → no rows (matching explode-of-null); empty array → no
    rows.  Counts are exact longs; items keep the element type."""
    staged = df.select(*keys, F.array_sort(arr).alias("__s"))
    n = F.col("__n")
    s = F.col("__s")
    staged = staged.withColumn("__n", F.size("__s"))
    # greatest(n, 1): sequence(1, 0) would COUNT DOWN ([1, 0]); the
    # n<=0/null cases yield a single bogus start that the final
    # empty-guard filters away.  F.get is 0-based and yields NULL out
    # of range (never an ANSI error); the run check is null-safe so
    # runs of NULL elements also split correctly.
    staged = staged.withColumn(
        "__starts",
        F.filter(
            F.sequence(F.lit(1), F.greatest(n, F.lit(1))),
            lambda i: (i == 1) | ~F.get(s, i - 1).eqNullSafe(F.get(s, i - 2)),
        ),
    )
    st = F.col("__starts")
    staged = staged.withColumn(
        "__hist",
        F.transform(
            F.sequence(F.lit(1), F.size("__starts")),
            lambda j: F.struct(
                F.get(s, F.get(st, j - 1) - 1).alias(item),
                (F.coalesce(F.get(st, j), n + 1) - F.get(st, j - 1))
                .cast("long")
                .alias(cnt),
            ),
        ),
    )
    guarded = F.when(n >= 1, F.col("__hist")).otherwise(
        F.filter(F.col("__hist"), lambda _: F.lit(False))
    )
    return staged.select(*keys, F.explode(guarded).alias("__h")).select(
        *keys, F.col(f"__h.{item}").alias(item), F.col(f"__h.{cnt}").alias(cnt)
    )


def type_token_ratio(toks: Column) -> Column:
    """Distinct/total token ratio — the classic lexical-diversity signal."""
    return F.size(F.array_distinct(toks)) / F.size(toks)


def stopword_ratio(toks: Column, stopwords: list[str]) -> Column:
    """Fraction of tokens in a stopword list (in-array filter, no join)."""
    sw = F.array(*[F.lit(s) for s in stopwords])
    return F.size(F.filter(toks, lambda t: F.array_contains(sw, t))) / F.size(toks)


def avg_token_len(toks: Column) -> Column:
    """Mean token length via a left-fold (no explode)."""
    total = F.aggregate(toks, F.lit(0), lambda acc, t: acc + F.length(t))
    return total / F.size(toks)


def quality_score(text: Column | str) -> Column:
    """Composite 0..1 quality heuristic: length-in-range, lexical
    diversity, stopword presence, sane mean word length — the standard
    pre-training filter shape (each term clamped to [0,1], averaged)."""
    c = F.col(text) if isinstance(text, str) else text
    t = tokens(c)
    n = F.size(t)
    len_term = F.least(n / F.lit(50.0), F.lit(1.0))
    ttr_term = type_token_ratio(t)
    sw_term = F.least(stopword_ratio(t, STOPWORDS["en"]) * 5, F.lit(1.0))
    wl = avg_token_len(t)
    wl_term = F.when((wl >= 3) & (wl <= 8), F.lit(1.0)).otherwise(F.lit(0.0))
    return F.round((len_term + ttr_term + sw_term + wl_term) / 4, 4)


def langid_scores(toks: Column) -> dict[str, Column]:
    """Per-language stopword-hit scores; argmax (with a floor) is the
    prediction.  Map-only; the score columns compose with any filter."""
    return {lang: stopword_ratio(toks, sws) for lang, sws in STOPWORDS.items()}


def fingerprint(toks: Column) -> Column:
    """Order-insensitive content fingerprint: md5 over the sorted
    distinct token set — the canonical-form dedup key (robust to
    shuffling/whitespace, unlike raw-text hashes)."""
    return F.md5(F.array_join(F.array_sort(F.array_distinct(toks)), " "))


#: PII battery: (name, regex, replacement tag).  Patterns are kept to
#: the RE2 ∩ Java-regex common subset so the same literal runs in Spark
#: (codegen regexp_replace) and the DuckDB oracle.  Redaction order
#: matters and is fixed: emails first (their local parts may contain
#: digit runs), then IPv4, then standalone long digit runs.
PII_PATTERNS: list[tuple[str, str, str]] = [
    ("email", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    ("ipv4", r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b", "<IP>"),
    ("idnum", r"\d{9,}", "<NUM>"),
]


def pii_counts(text: Column | str) -> dict[str, Column]:
    """Per-pattern match counts on the ORIGINAL text.  Counts are
    independent per pattern and MAY overlap: an email whose local part
    contains a 9+ digit run (``123456789@x.com``) is counted by both
    ``email`` and ``idnum`` (IPv4 octets, ≤3 digits each, never form
    one).  The oracle counts the same way, so parity holds; redaction
    (:func:`redact_pii`) is where ordering de-overlaps — emails are
    replaced first, so their digits are gone before idnum runs.
    Map-only."""
    c = F.col(text) if isinstance(text, str) else text
    return {
        name: F.size(F.regexp_extract_all(c, F.lit(pat), F.lit(0))).cast("long")
        for name, pat, _ in PII_PATTERNS
    }


def redact_pii(text: Column | str) -> Column:
    """Chained global regexp_replace over :data:`PII_PATTERNS` — one
    codegen projection, no Python.  Clean text passes through
    byte-identical (pinned by the oracle md5 comparison)."""
    c = F.col(text) if isinstance(text, str) else text
    for _, pat, tag in PII_PATTERNS:
        c = F.regexp_replace(c, pat, tag)
    return c

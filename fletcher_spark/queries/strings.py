"""String surface queries (SURVEY.md §2.6) over the ``documents`` table.

Each query exercises one functional group of the reference's string
centerpiece (fletcher/algorithms/string.py, string_array.py,
string_mixin.py) through `fletcher_spark.operators.strings`, with a
DuckDB oracle proving value parity.  Where Java and RE2 regex dialects
both support a construct (Unicode property classes, ``(?s)``), the
oracle runs the *same* pattern so parity is by construction.

Scale notes: every query below is scan → project (no shuffle, no sort)
— string compute is embarrassingly parallel, so the 100 TB plan is
identical to the sf0.001 plan modulo partition count.  ``udf_*``
queries are the documented slow tier (Arrow batch → Python).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from fletcher_spark.io import load_tables, spread
from fletcher_spark.operators import strings as S
from fletcher_spark.operators import udf as U
from fletcher_spark.queries.registry import query


@query(
    "str_predicates",
    oracle="""
SELECT
  doc_id,
  contains(text, 'spark')                    AS has_spark,
  starts_with(text, 'the')                   AS starts_the,
  suffix(text, 'row')                        AS ends_row,
  regexp_matches(text, 'sp[a-z]+k')          AS has_regex,
  contains(lower(text), 'spark')             AS has_spark_ci,
  contains(text, '')                         AS has_empty
FROM documents
""",
)
def str_predicates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """contains (literal/regex/case-insensitive/empty), startswith,
    endswith — reference KMP + prefix/suffix kernels
    (fletcher/algorithms/string.py:240-328, :687-724)."""
    d = load_tables(spark, sf_dir)["documents"]
    return d.select(
        "doc_id",
        S.contains("text", "spark").alias("has_spark"),
        S.startswith("text", "the").alias("starts_the"),
        S.endswith("text", "row").alias("ends_row"),
        S.contains("text", "sp[a-z]+k", regex=True).alias("has_regex"),
        S.contains("text", "SPARK", case=False).alias("has_spark_ci"),
        S.contains("text", "").alias("has_empty"),
    )


@query(
    "str_count_find",
    oracle="""
SELECT
  doc_id,
  CAST((length(text) - length(replace(text, 'spark', ''))) / 5 AS BIGINT) AS n_spark,
  CAST(len(regexp_extract_all(text, 's[a-z]*k')) AS BIGINT)               AS n_regex,
  strpos(text, 'key') - 1                                                 AS find_key,
  CASE WHEN strpos(reverse(text), reverse('ta')) = 0 THEN -1
       ELSE length(text) - 2 - (strpos(reverse(text), reverse('ta')) - 1)
  END                                                                     AS rfind_ta,
  length(text)                                                            AS n_chars2,
  length(text) + 1                                                        AS n_empty
FROM documents
""",
)
def str_count_find(spark: SparkSession, sf_dir: str) -> DataFrame:
    """count literal/regex (KMP counting kernel string.py:163-237 incl.
    the empty-pattern→len+1 edge), find/rfind (0-based, -1 absent),
    length."""
    d = load_tables(spark, sf_dir)["documents"]
    return d.select(
        "doc_id",
        S.count_occurrences("text", "spark").cast("long").alias("n_spark"),
        S.count_occurrences("text", "s[a-z]*k", regex=True).cast("long").alias("n_regex"),
        S.find("text", "key").alias("find_key"),
        S.rfind("text", "ta").alias("rfind_ta"),
        S.length("text").alias("n_chars2"),
        S.count_occurrences("text", "").cast("long").alias("n_empty"),
    )


@query(
    "str_case_transforms",
    oracle="""
SELECT
  doc_id,
  upper(src30)                                   AS up,
  lower(upper(src30))                            AS lo,
  upper(src30[1:1]) || lower(src30[2:])          AS cap,
  array_to_string(
    list_transform(string_split(src30, ' '),
                   w -> upper(w[1:1]) || lower(w[2:])), ' ') AS ti,
  translate(src30, 'abcdefghijklmnopqrstuvwxyzABCDEFGHIJKLMNOPQRSTUVWXYZ',
                   'ABCDEFGHIJKLMNOPQRSTUVWXYZabcdefghijklmnopqrstuvwxyz') AS sw
FROM (SELECT doc_id, text[1:30] AS src30 FROM documents)
""",
)
def str_case_transforms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """lower/upper/capitalize/title/swapcase — reference tier:
    pc.utf8_* + pandas fallback (fletcher/string_mixin.py:26-36)."""
    d = load_tables(spark, sf_dir)["documents"]
    src = F.substring("text", 1, 30).alias("src30")
    d = d.select("doc_id", src)
    return d.select(
        "doc_id",
        S.upper("src30").alias("up"),
        S.lower(S.upper("src30")).alias("lo"),
        S.capitalize("src30").alias("cap"),
        S.title("src30").alias("ti"),
        S.swapcase("src30").alias("sw"),
    )


@query(
    "str_trim_pad",
    oracle="""
WITH t AS (
  SELECT doc_id, source, '  ' || source || CHR(9) AS padded,
         CAST(-n_chars AS VARCHAR) AS neg, n_chars
  FROM documents
)
SELECT
  doc_id,
  trim(padded, ' ' || CHR(9) || CHR(10) || CHR(13))   AS stripped,
  ltrim(padded, ' ' || CHR(9) || CHR(10) || CHR(13))  AS lstripped,
  rtrim(padded, ' ' || CHR(9) || CHR(10) || CHR(13))  AS rstripped,
  trim(source, 'sr0123456789')    AS strip_set,
  lpad(source, 10, '*')           AS lp,
  rpad(source, 10, '.')           AS rp,
  -- center(10): CPython left = marg//2 + (marg & 10 & 1)
  rpad(lpad(source,
            CAST(length(source) + ((10 - length(source)) // 2
                 + ((10 - length(source)) & 10 & 1)) AS INT), '^'),
       10, '^')                   AS ctr,
  '-' || lpad(CAST(n_chars AS VARCHAR), 7, '0') AS zf
FROM t
""",
)
def str_trim_pad(spark: SparkSession, sf_dir: str) -> DataFrame:
    """strip/lstrip/rstrip (default ws + char-set,
    fletcher/algorithms/string.py:545-684), lpad/rpad/center
    (string_array.py pad family), zfill with sign handling."""
    d = load_tables(spark, sf_dir)["documents"]
    t = d.select(
        "doc_id",
        "source",
        F.concat(F.lit("  "), F.col("source"), F.lit("\t")).alias("padded"),
        F.concat(F.lit("-"), F.col("n_chars").cast("string")).alias("neg"),
    )
    return t.select(
        "doc_id",
        S.strip("padded").alias("stripped"),
        S.lstrip("padded").alias("lstripped"),
        S.rstrip("padded").alias("rstripped"),
        S.strip("source", "sr0123456789").alias("strip_set"),
        S.pad("source", 10, "left", "*").alias("lp"),
        S.pad("source", 10, "right", ".").alias("rp"),
        S.center("source", 10, "^").alias("ctr"),
        S.zfill("neg", 8).alias("zf"),
    )


@query(
    "str_slice_substr",
    oracle="""
SELECT
  doc_id,
  text[6:25]                                                   AS sub,
  text[-10:]                                                   AS tail10,
  regexp_replace(text[11:], '(?s)(.).{0,2}', '\\1', 'g')       AS step3,
  reverse(text[1:20])                                          AS rev20,
  regexp_replace(reverse(text), '(?s)(.).{0,1}', '\\1', 'g')   AS negstep,
  text[4:4]                                                    AS get3
FROM documents
""",
)
def str_slice_substr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """slice by codepoint incl. step and negative step — the reference's
    three-kernel family (fletcher/algorithms/string.py:727-908) — as
    substring/reverse/stride-regex compositions (zero UDFs)."""
    d = load_tables(spark, sf_dir)["documents"]
    return d.select(
        "doc_id",
        S.slice_codepoints("text", 5, 25).alias("sub"),
        S.slice_codepoints("text", -10, None).alias("tail10"),
        S.slice_codepoints("text", 10, None, 3).alias("step3"),
        S.slice_codepoints("text", 19, None, -1).alias("rev20"),
        S.slice_codepoints("text", None, None, -2).alias("negstep"),
        S.get("text", 3).alias("get3"),
    )


@query(
    "str_replace_ops",
    oracle="""
WITH p AS (
  SELECT doc_id, text, source, string_split(text, 'a') AS parts FROM documents
)
SELECT
  doc_id,
  replace(text, 'the', 'THE')                          AS rep_all,
  regexp_replace(text, '[aeiou]', '_', 'g')            AS rep_regex,
  array_to_string(list_slice(parts, 1, least(3, len(parts))), '@')
    || CASE WHEN len(parts) > 3
            THEN 'a' || array_to_string(list_slice(parts, 4, len(parts)), 'a')
            ELSE '' END                                AS rep_first2,
  text[1:3] || '<<>>' || text[10:]                     AS slice_repl,
  repeat(source, 2)                                    AS rep2
FROM p
""",
)
def str_replace_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """replace all/regex/first-n (two-pass KMP kernel
    fletcher/algorithms/string.py:331-542; first-n via the JVM-side
    split-limit trick), slice_replace, repeat."""
    d = load_tables(spark, sf_dir)["documents"]
    slice_repl = F.concat(
        S.slice_codepoints("text", 0, 3), F.lit("<<>>"), S.slice_codepoints("text", 9, None)
    )
    return d.select(
        "doc_id",
        S.replace("text", "the", "THE").alias("rep_all"),
        S.replace("text", "[aeiou]", "_", regex=True).alias("rep_regex"),
        S.replace("text", "a", "@", n=2).alias("rep_first2"),
        slice_repl.alias("slice_repl"),
        S.repeat("source", 2).alias("rep2"),
    )


@query(
    "str_split_partition",
    oracle="""
SELECT
  doc_id,
  split_part(text, ' ', 2)                          AS word2,
  string_split(text, ' ')[-1]                       AS last_word,
  CAST(len(string_split(text, ' ')) AS INT)      AS n_tokens,
  CASE WHEN strpos(text, 'the') > 0 THEN text[1:strpos(text, 'the') - 1] ELSE text END AS part_before,
  CASE WHEN strpos(text, 'the') > 0 THEN 'the' ELSE '' END                             AS part_sep,
  CASE WHEN strpos(text, 'the') > 0 THEN text[strpos(text, 'the') + 3:] ELSE '' END    AS part_after,
  CASE WHEN strpos(reverse(text), reverse('data')) > 0
       THEN reverse(text)[strpos(reverse(text), reverse('data')) + 4:] ELSE '' END     AS rpart_before_rev
FROM documents
""",
)
def str_split_partition(spark: SparkSession, sf_dir: str) -> DataFrame:
    """split_part (1-based, negative-from-end), token counts,
    partition/rpartition (pandas fallback tier,
    /root/reference/tests/test_text.py:552-640)."""
    d = load_tables(spark, sf_dir)["documents"]
    before, mid, after = S.partition("text", "the")
    rb, _, _ = S.rpartition("text", "data")
    return d.select(
        "doc_id",
        S.split_part("text", " ", 2).alias("word2"),
        S.split_part("text", " ", -1).alias("last_word"),
        F.size(F.split("text", " ", -1)).alias("n_tokens"),
        before.alias("part_before"),
        mid.alias("part_sep"),
        after.alias("part_after"),
        # compare rpartition-before via its reverse so the oracle stays
        # a single expression (reverse trick on both sides)
        F.reverse(rb).alias("rpart_before_rev"),
    )


@query(
    "str_extract_regex",
    oracle="""
SELECT
  doc_id,
  regexp_extract(source, '([0-9]+)', 1)                   AS src_num,
  regexp_matches(text, '^(?:[a-z]+)')                     AS m_start,
  regexp_matches(text, '^(?:[a-z ]+)$')                   AS m_full,
  regexp_extract(text, '(s[a-z]+) (t[a-z]+)', 2)          AS group2
FROM documents
""",
)
def str_extract_regex(spark: SparkSession, sf_dir: str) -> DataFrame:
    """extract (group), match (anchored start), fullmatch — pandas
    fallback tier (/root/reference/tests/test_text.py:458-536)."""
    d = load_tables(spark, sf_dir)["documents"]
    # both engines return '' for no-match on these always-match patterns;
    # group2 may genuinely miss → align both to '' via coalesce on Spark
    return d.select(
        "doc_id",
        F.regexp_extract("source", "([0-9]+)", 1).alias("src_num"),
        S.match("text", "[a-z]+").alias("m_start"),
        S.fullmatch("text", "[a-z ]+").alias("m_full"),
        F.regexp_extract("text", "(s[a-z]+) (t[a-z]+)", 2).alias("group2"),
    )


@query(
    "str_extractall_tokens",
    oracle="""
SELECT doc_id, unnest(regexp_extract_all(text, 's[a-z]+')) AS m
FROM documents
""",
)
def str_extractall_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    """extractall / findall: one output row per regex match
    (reference: pandas fallback, tests/test_text.py:466-484).
    posexplode-shaped; scale = row-multiplying map, no shuffle."""
    d = load_tables(spark, sf_dir)["documents"]
    return d.select(
        "doc_id",
        F.explode(F.regexp_extract_all("text", F.lit("s[a-z]+"), 0)).alias("m"),
    )


#: fixture rows exercising Unicode/sign/space edges the corpus lacks
#: (reference analogue: fletcher/testing.py:6-33 curated examples).
_CLASSIFY_FIXTURE = [
    "Hello",
    "WORLD",
    "abc123",
    "42",
    "3½",
    "½",
    " \t",
    "",
    "Title Case",
    "mIxEd",
    "ünïcödé",
]


@query(
    "str_classify",
    oracle="""
WITH u AS (
  SELECT split_part(text, ' ', 1) AS s FROM documents
  UNION ALL
  SELECT * FROM (VALUES ('Hello'), ('WORLD'), ('abc123'), ('42'), ('3½'),
                        ('½'), (' ' || CHR(9)), (''), ('Title Case'),
                        ('mIxEd'), ('ünïcödé')) v(s)
)
SELECT
  s,
  regexp_matches(s, '^\\p{L}+$')                                  AS is_alpha,
  regexp_matches(s, '^\\p{Nd}+$')                                 AS is_digit,
  regexp_matches(s, '^\\p{N}+$')                                  AS is_numeric,
  regexp_matches(s, '^[\\p{L}\\p{N}]+$')                          AS is_alnum,
  regexp_matches(s, '^\\s+$')                                     AS is_space,
  regexp_matches(s, '\\p{Ll}') AND NOT regexp_matches(s, '\\p{Lu}') AS is_lower,
  regexp_matches(s, '\\p{Lu}') AND NOT regexp_matches(s, '\\p{Ll}') AS is_upper,
  regexp_matches(s, '^[^\\p{L}]*\\p{Lu}\\p{Ll}*(?:[^\\p{L}]+\\p{Lu}\\p{Ll}*)*[^\\p{L}]*$') AS is_title
FROM u
""",
)
def str_classify(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The 9 is-classifications (fletcher/string_mixin.py:38-91) via
    Unicode property regexes valid in BOTH Java and RE2 — the oracle
    runs the identical pattern, so parity is by construction."""
    d = load_tables(spark, sf_dir)["documents"]
    base = d.select(F.split_part("text", F.lit(" "), F.lit(1)).alias("s"))
    fixture = spark.createDataFrame([(s,) for s in _CLASSIFY_FIXTURE], "s string")
    u = base.unionAll(fixture)
    return u.select(
        "s",
        S.isalpha("s").alias("is_alpha"),
        S.isdigit("s").alias("is_digit"),
        S.isnumeric("s").alias("is_numeric"),
        S.isalnum("s").alias("is_alnum"),
        S.isspace("s").alias("is_space"),
        S.islower("s").alias("is_lower"),
        S.isupper("s").alias("is_upper"),
        S.istitle("s").alias("is_title"),
    )


@query(
    "str_cat_dummies",
    oracle="""
SELECT
  doc_id,
  lang || ':' || source                                   AS cat_ls,
  concat_ws('|', lang, source, CAST(n_chars AS VARCHAR))  AS cat_ws,
  CAST(list_contains(string_split(text, ' '), 'spark') AS INT)  AS d_spark,
  CAST(list_contains(string_split(text, ' '), 'join') AS INT)   AS d_join,
  CAST(list_contains(string_split(text, ' '), 'window') AS INT) AS d_window,
  CAST(list_contains(string_split(text, ' '), 'the') AS INT)    AS d_the
FROM documents
""",
)
def str_cat_dummies(spark: SparkSession, sf_dir: str) -> DataFrame:
    """cat (null-propagating concat, fletcher/algorithms/string.py:94-118)
    + concat_ws + get_dummies (split→membership flags; the
    split+explode+pivot variant shuffles — membership flags stay in the
    scan stage, the right plan at 100 TB for a FIXED vocabulary;
    reference: benchmarks/text.py:565-579)."""
    d = load_tables(spark, sf_dir)["documents"]
    toks = F.split("text", " ", -1)
    return d.select(
        "doc_id",
        S.cat("lang", S.cat(F.lit(":"), "source")).alias("cat_ls"),
        F.concat_ws("|", "lang", "source", F.col("n_chars").cast("string")).alias("cat_ws"),
        F.array_contains(toks, "spark").cast("int").alias("d_spark"),
        F.array_contains(toks, "join").cast("int").alias("d_join"),
        F.array_contains(toks, "window").cast("int").alias("d_window"),
        F.array_contains(toks, "the").cast("int").alias("d_the"),
    )


@query(
    "udf_prefix_length",
    oracle="""
SELECT
  doc_id,
  coalesce(list_max(list_filter(range(1, least(length(text), length(text2)) + 1),
                                i -> text[1:i] = text2[1:i])), 0) AS plen
FROM (SELECT doc_id, text, replace(text, 'a', '4') AS text2 FROM documents)
""",
)
def udf_prefix_length(spark: SparkSession, sf_dir: str) -> DataFrame:
    """apply_binary_str harness demo (fletcher/algorithms/string.py:
    1046-1119): common-prefix length of (text, text-with-a→4) via an
    Arrow-vectorized pandas_udf.  The oracle re-derives prefix length
    with a DuckDB list lambda — O(L²) per row, fine at oracle scale."""
    d = load_tables(spark, sf_dir)["documents"]
    text2 = F.replace(F.col("text"), F.lit("a"), F.lit("4"))
    return d.select(
        "doc_id",
        U.prefix_length(F.col("text"), text2).alias("plen"),
    )


@query(
    "udf_wrap_normalize",
    oracle="""
SELECT doc_id,
  CAST(list_reduce(list_transform(string_split(text, ' '), w -> len(w)),
       (a, w) -> CASE WHEN a % 1000 + 1 + w <= 40 THEN a + 1 + w
                      ELSE (a // 1000 + 1) * 1000 + w END) // 1000 + 1 AS INT) AS n_lines,
  nfc_normalize(lang) AS lang_nfc,
  lower(source) AS src_cf
FROM documents
""",
)
def udf_wrap_normalize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Python-semantics tier: textwrap.wrap + unicodedata.normalize +
    true casefold (fletcher pandas-fallback functions wrap/normalize/
    casefold, tests/test_text.py:536, :805).  The Spark side runs the
    real Python UDFs; the oracle re-derives each independently —
    greedy word-wrap line count as a ``list_reduce`` fold over word
    lengths (state packed as (lines-1)*1000 + current-line-length,
    exact because the corpus is single-spaced with words ≤ width, the
    regime where ``textwrap.wrap`` IS greedy fill), ``nfc_normalize``
    for NFC, and ``lower`` for casefold on the ASCII ``source`` column
    (casefold == lower on ASCII).  Full non-ASCII/hyphenation
    semantics stay pinned Python-vs-Python in tests/test_udf.py."""
    # spread: the Python-UDF stage ran as ONE task on the single-split
    # scan (r13; identity at scale) — map-only output, order-free
    d = spread(load_tables(spark, sf_dir)["documents"])
    return d.select(
        "doc_id",
        F.size(U.wrap(F.col("text"), 40)).alias("n_lines"),
        U.normalize(F.col("lang"), "NFC").alias("lang_nfc"),
        U.casefold(F.col("source")).alias("src_cf"),
    )


@query(
    "str_rsplit_translate",
    oracle="""
WITH t AS (
  SELECT doc_id, text, source,
         length(text) - strpos(reverse(text), ' ') + 1 AS lastsp
  FROM documents
)
SELECT
  doc_id,
  text[1:lastsp - 1]                       AS rsplit_head,
  text[lastsp + 1:]                        AS rsplit_tail,
  translate(text[1:40], 'aeiou', 'AEIOU')  AS translated,
  translate(source, 'src', '')             AS deleted,
  repeat(source, 3)                        AS rep3
FROM t
""",
)
def str_rsplit_translate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """rsplit (maxsplit=1, reverse+split-limit trick — pandas fallback
    tier, /root/reference/tests/test_text.py:693), translate with both
    mapping and deletion (fletcher string_mixin translate row), repeat.
    The oracle derives rsplit positions from the last-space reverse
    scan — same construction, independent engine."""
    d = load_tables(spark, sf_dir)["documents"]
    parts = S.rsplit("text", " ", 1)
    return d.select(
        "doc_id",
        F.element_at(parts, 1).alias("rsplit_head"),
        F.element_at(parts, 2).alias("rsplit_tail"),
        S.translate(S.slice_codepoints("text", 0, 40), {"a": "A", "e": "E", "i": "I", "o": "O", "u": "U"}).alias("translated"),
        S.translate("source", {"s": None, "r": None, "c": None}).alias("deleted"),
        S.repeat("source", 3).alias("rep3"),
    )

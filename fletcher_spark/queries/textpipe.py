"""Text-analysis queries over ``documents`` (LLM-pipeline extensions):
per-doc statistics, quality scores, language-ID heuristic, n-gram
corpus counts, content fingerprints — all DuckDB-oracle-checked.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from fletcher_spark.io import load_tables, spread
from fletcher_spark.pipeline import textpipe as T
from fletcher_spark.queries.registry import query


@query(
    "text_stats",
    oracle="""
WITH t AS (SELECT doc_id, text, string_split_regex(text, '\\s+') AS toks FROM documents)
SELECT
  doc_id,
  CAST(len(toks) AS INT)                          AS n_tokens,
  CAST(len(list_distinct(toks)) AS INT)           AS n_types,
  round(len(list_distinct(toks))::DOUBLE / len(toks), 4) AS ttr,
  round(list_reduce(list_transform(toks, x -> length(x)::BIGINT), (a,b) -> a+b)::DOUBLE
        / len(toks), 4)                           AS avg_word_len,
  CAST(strlen(text) AS INT)                       AS n_bytes,
  CAST(ceil(strlen(text) / 4.0) AS BIGINT)        AS bpe_est
FROM t
""",
)
def text_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-doc token/type counts, type-token ratio, mean word length,
    byte length, and the bytes/4 BPE-token estimate — all left-folds
    over the token array, map-only (the 100 TB plan is scan→project)."""
    d = load_tables(spark, sf_dir)["documents"]
    toks = T.tokens("text")
    t = d.select("doc_id", "text", toks.alias("toks"))
    return t.select(
        "doc_id",
        F.size("toks").alias("n_tokens"),
        F.size(F.array_distinct("toks")).alias("n_types"),
        F.round(T.type_token_ratio(F.col("toks")), 4).alias("ttr"),
        F.round(T.avg_token_len(F.col("toks")), 4).alias("avg_word_len"),
        F.octet_length("text").alias("n_bytes"),
        F.ceil(F.octet_length("text") / 4.0).alias("bpe_est"),
    )


@query(
    "text_quality",
    oracle="""
WITH t AS (SELECT doc_id, string_split_regex(text, '\\s+') AS toks FROM documents),
m AS (
  SELECT doc_id,
    least(len(toks) / 50.0, 1.0) AS len_term,
    len(list_distinct(toks))::DOUBLE / len(toks) AS ttr_term,
    least(len(list_filter(toks, x -> list_contains(['the','a','of','and'], x)))::DOUBLE
          / len(toks) * 5, 1.0) AS sw_term,
    CASE WHEN list_reduce(list_transform(toks, x -> length(x)::BIGINT), (a,b)->a+b)::DOUBLE
              / len(toks) BETWEEN 3 AND 8 THEN 1.0 ELSE 0.0 END AS wl_term
  FROM t
)
SELECT doc_id, round((len_term + ttr_term + sw_term + wl_term) / 4, 4) AS quality
FROM m
""",
)
def text_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Composite pre-training quality filter (length, lexical diversity,
    stopword presence, word-length sanity) — pipeline/textpipe.py:
    quality_score; the shape every curation pipeline runs first."""
    d = load_tables(spark, sf_dir)["documents"]
    return d.select("doc_id", T.quality_score("text").alias("quality"))


@query(
    "text_langid",
    oracle="""
WITH t AS (SELECT doc_id, lang, string_split_regex(text, '\\s+') AS toks FROM documents),
s AS (
  SELECT doc_id, lang,
    round(len(list_filter(toks, x -> list_contains(['the','a','of','and'], x)))::DOUBLE / len(toks), 4) AS s_en,
    round(len(list_filter(toks, x -> list_contains(['der','die','und','das'], x)))::DOUBLE / len(toks), 4) AS s_de,
    round(len(list_filter(toks, x -> list_contains(['el','la','de','y'], x)))::DOUBLE / len(toks), 4) AS s_es
  FROM t
)
SELECT doc_id, lang, s_en, s_de, s_es,
       CASE WHEN s_en >= s_de AND s_en >= s_es AND s_en > 0.01 THEN 'en'
            WHEN s_de >= s_es AND s_de > 0.01 THEN 'de'
            WHEN s_es > 0.01 THEN 'es'
            ELSE 'unk' END AS pred
FROM s
""",
)
def text_langid(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stopword-hit language-ID heuristic: one score column per
    language + deterministic argmax-with-floor.  The mechanism (score
    columns → argmax) is what a fastText-style model slots into; on
    this vocab-shared synthetic corpus 'en' dominates by construction."""
    d = load_tables(spark, sf_dir)["documents"]
    t = d.select("doc_id", "lang", T.tokens("text").alias("toks"))
    scores = T.langid_scores(F.col("toks"))
    s = t.select(
        "doc_id",
        "lang",
        F.round(scores["en"], 4).alias("s_en"),
        F.round(scores["de"], 4).alias("s_de"),
        F.round(scores["es"], 4).alias("s_es"),
    )
    pred = (
        F.when((F.col("s_en") >= F.col("s_de")) & (F.col("s_en") >= F.col("s_es")) & (F.col("s_en") > 0.01), "en")
        .when((F.col("s_de") >= F.col("s_es")) & (F.col("s_de") > 0.01), "de")
        .when(F.col("s_es") > 0.01, "es")
        .otherwise("unk")
    )
    return s.withColumn("pred", pred)


@query(
    "text_ngrams_top",
    oracle="""
WITH t AS (SELECT doc_id, string_split_regex(text, '\\s+') AS toks FROM documents),
g AS (
  SELECT unnest(list_transform(range(1, len(toks)),
                i -> toks[i] || ' ' || toks[i+1])) AS bigram
  FROM t WHERE len(toks) >= 2
)
SELECT bigram, count(*) AS n
FROM g GROUP BY bigram
ORDER BY n DESC, bigram
LIMIT 10
""",
)
def text_ngrams_top(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-level top-10 word bigrams: per-doc n-grams (map-only) →
    explode → partial+final count aggregate → TakeOrderedAndProject.
    The one intentional shuffle in the text pipeline, keyed on the
    n-gram (map-side combine bounds it by distinct-gram count)."""
    d = spread(load_tables(spark, sf_dir)["documents"])
    g = d.select(F.explode(T.ngrams(T.tokens("text"), 2)).alias("bigram"))
    return (
        g.groupBy("bigram")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy(F.col("n").desc(), "bigram")
        .limit(10)
    )


@query(
    "text_fingerprint",
    oracle="""
WITH t AS (SELECT doc_id, string_split_regex(text, '\\s+') AS toks FROM documents)
SELECT doc_id,
       md5(array_to_string(list_sort(list_distinct(toks)), ' ')) AS fp,
       substr(md5(array_to_string(list_sort(list_distinct(toks)), ' ')), 1, 8) AS fp_short
FROM t
""",
)
def text_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Order-insensitive content fingerprint (md5 over sorted distinct
    tokens) + 32-bit short form — the canonical-form dedup key
    (pipeline/textpipe.py:fingerprint)."""
    d = load_tables(spark, sf_dir)["documents"]
    fp = T.fingerprint(T.tokens("text"))
    return d.select(
        "doc_id", fp.alias("fp"), F.substring(fp, 1, 8).alias("fp_short")
    )


@query(
    "pipeline_curate_corpus",
    oracle="""
WITH t AS (
  SELECT doc_id, text, lang, string_split_regex(text, '\\s+') AS toks
  FROM documents
),
scored AS (
  SELECT doc_id, text, lang, toks,
    (least(len(toks) / 50.0, 1.0)
     + len(list_distinct(toks))::DOUBLE / len(toks)
     + least(len(list_filter(toks, x -> list_contains(['the','a','of','and'], x)))::DOUBLE
             / len(toks) * 5, 1.0)
     + CASE WHEN list_reduce(list_transform(toks, x -> length(x)::BIGINT), (a,b)->a+b)::DOUBLE
                 / len(toks) BETWEEN 3 AND 8 THEN 1.0 ELSE 0.0 END) / 4 AS quality
  FROM t
),
kept AS (SELECT * FROM scored WHERE quality >= 0.5),
-- exact dedup on the canonical-form fingerprint, keep-min
fp AS (
  SELECT *, md5(array_to_string(list_sort(list_distinct(toks)), ' ')) AS fp
  FROM kept
),
keepers AS (
  SELECT fp, min(doc_id) AS keep_id FROM fp GROUP BY fp
),
exact_kept AS (
  SELECT f.* FROM fp f JOIN keepers k ON f.fp = k.fp AND f.doc_id = k.keep_id
),
-- near-dup removal: drop the higher doc_id of every minhash-LSH pair
sh AS (
  SELECT doc_id,
    list_distinct(CASE WHEN len(toks) >= 3
      THEN list_transform(range(1, len(toks) - 1),
                          i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2])
      ELSE [array_to_string(toks, ' ')] END) AS s
  FROM exact_kept
),
hv AS (
  SELECT doc_id, s,
         list_transform(s, x -> ('0x' || substr(md5(x), 1, 14))::BIGINT) AS v1,
         list_transform(s, x -> ('0x' || substr(md5(x), 15, 14))::BIGINT) AS v2
  FROM sh
),
sig AS (
  SELECT doc_id, s, [
    {minhashes}
  ] AS sg
  FROM hv
),
bands AS (
  SELECT doc_id, b.band AS band,
         md5(sg[b.band*3+1]::VARCHAR || '|' || sg[b.band*3+2]::VARCHAR || '|' || sg[b.band*3+3]::VARCHAR) AS key
  FROM sig, (SELECT unnest([0,1,2,3]) AS band) b
),
cand AS (
  SELECT DISTINCT a.doc_id AS id1, b2.doc_id AS id2
  FROM bands a
  JOIN bands b2 ON a.band = b2.band AND a.key = b2.key AND a.doc_id < b2.doc_id
),
near_dupes AS (
  SELECT DISTINCT id2 AS doc_id
  FROM cand
  JOIN sh s1 ON s1.doc_id = id1
  JOIN sh s2 ON s2.doc_id = id2
  WHERE len(list_intersect(s1.s, s2.s))::DOUBLE
        / len(list_distinct(list_concat(s1.s, s2.s))) >= 0.5
)
SELECT e.doc_id, e.lang, round(e.quality, 4) AS quality, e.fp
FROM exact_kept e
LEFT JOIN near_dupes nd ON e.doc_id = nd.doc_id
WHERE nd.doc_id IS NULL
""".format(
        minhashes=",\n    ".join(
            "list_min(list_transform(range(1, len(s) + 1), "
            f"i -> (v1[i] + {j} * v2[i]) % 2305843009213693951))"
            for j in range(12)
        )
    ),
)
def pipeline_curate_corpus(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The full curation pipeline as ONE composed Catalyst plan — the
    flagship LLM-data query: quality filter (≥0.5) → exact dedup on the
    canonical fingerprint (keep-min) → MinHash-LSH near-dup removal
    (drop the higher doc_id of each verified J≥0.5 pair) → curated
    (doc_id, lang, quality, fingerprint).

    Composes pipeline/textpipe.py and pipeline/dedup.py unchanged —
    each stage is a DataFrame-in/DataFrame-out transformation, so the
    optimizer sees the whole pipeline (quality filter pushes below
    shingling; only survivors are sketched).  Shuffles: fingerprint
    group, minhash aggregate, band bucket join, anti join — each keyed,
    each map-side combined where algebraic.
    """
    from fletcher_spark.pipeline import dedup as D

    d = spread(load_tables(spark, sf_dir)["documents"])
    toks = T.tokens("text")

    kept = d.select(
        "doc_id", "text", "lang", T.quality_score("text").alias("quality")
    ).filter(F.col("quality") >= 0.5)

    fp = kept.withColumn("fp", T.fingerprint(T.tokens("text")))
    keepers = fp.groupBy("fp").agg(F.min("doc_id").alias("keep_id")).alias("k")
    fpa = fp.alias("f")
    # exact_kept feeds shingling AND the final anti-join, and sh feeds
    # the signature AND both verify sides: persist both or the
    # quality→fingerprint→keep-min sub-DAG re-executes per consumer
    # (~5× measured at sf0.1)
    exact_kept = fpa.join(
        keepers,
        (F.col("f.fp") == F.col("k.fp")) & (F.col("f.doc_id") == F.col("k.keep_id")),
    ).select(
        F.col("f.doc_id").alias("doc_id"),
        F.col("f.text").alias("text"),
        F.col("f.lang").alias("lang"),
        F.col("f.quality").alias("quality"),
        F.col("f.fp").alias("fp"),
    ).persist()

    sh = exact_kept.select("doc_id", D.word_shingles("text", 3).alias("shingles")).persist()
    sig = D.minhash_signature_df(sh, "doc_id", "shingles", 12)
    banded = sig.select("doc_id", D.lsh_band_keys(F.col("sig"), 4, 3).alias("band_keys"))
    pairs = D.candidate_pairs(banded, "doc_id")
    near = D.verify_jaccard(pairs, sh, "doc_id", "shingles", 0.5)
    dupes = near.select(F.col("id2").alias("doc_id")).distinct()

    return exact_kept.join(dupes, "doc_id", "left_anti").select(
        "doc_id", "lang", F.round("quality", 4).alias("quality"), "fp"
    )

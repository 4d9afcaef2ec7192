"""PII battery semantics on PLANTED data — the corpus itself is
PII-free (the oracle comparison pins the no-false-positive property),
so the positive cases live here."""

from __future__ import annotations

from pyspark.sql import functions as F

from fletcher_spark.pipeline import textpipe as T


def test_pii_redaction_planted(spark):
    rows = [
        (1, "contact alice.smith+news@example.co.uk for details"),
        (2, "server at 192.168.0.1 responded"),
        (3, "account 123456789012 was closed"),
        (4, "mixed bob@test.org from 10.0.0.7 ref 987654321"),
        (5, "clean text with no identifiers at all"),
        (6, "short num 12345678 stays"),  # 8 digits < the 9-digit floor
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    counts = T.pii_counts("text")
    out = {
        r["doc_id"]: r
        for r in df.select(
            "doc_id",
            counts["email"].alias("e"),
            counts["ipv4"].alias("i"),
            counts["idnum"].alias("n"),
            T.redact_pii("text").alias("red"),
        ).collect()
    }
    assert (out[1]["e"], out[1]["i"], out[1]["n"]) == (1, 0, 0)
    assert out[1]["red"] == "contact <EMAIL> for details"
    assert out[2]["red"] == "server at <IP> responded"
    assert out[3]["red"] == "account <NUM> was closed"
    assert (out[4]["e"], out[4]["i"], out[4]["n"]) == (1, 1, 1)
    assert out[4]["red"] == "mixed <EMAIL> from <IP> ref <NUM>"
    # clean text must pass through byte-identical (false positives are
    # corpus damage at scale)
    assert out[5]["red"] == rows[4][1]
    assert out[6]["red"] == rows[5][1]


def test_contamination_counts_shared_ngrams(spark):
    """A training doc sharing an 8-gram with the benchmark doc is
    flagged; disjoint docs report zero."""
    from fletcher_spark.pipeline.textpipe import ngrams, tokens

    shared = "one two three four five six seven eight"
    rows = [
        (0, shared + " nine"),       # benchmark member (0 % 97 == 0)
        (10, "x " + shared),         # shares the 8-gram
        (11, "totally different words here making eight grams yes"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    g = df.select(
        "doc_id", F.array_distinct(ngrams(tokens("text"), 8)).alias("grams")
    ).filter(F.size("grams") > 0)
    bench = (
        g.filter(F.col("doc_id") % 97 == 0)
        .select(F.explode("grams").alias("gram"))
        .distinct()
    )
    hits = (
        g.filter(F.col("doc_id") % 97 != 0)
        .select("doc_id", F.explode("grams").alias("gram"))
        .join(F.broadcast(bench), "gram")
        .groupBy("doc_id")
        .count()
    )
    got = {r["doc_id"]: r["count"] for r in hits.collect()}
    assert got == {10: 1}

"""Lexical-retrieval semantics: the positional phrase matcher counts
self-overlapping chains correctly (through the query's own join via
phrase_hits), the naive array-scan agrees, and the BM25/RRF rankings
are well-formed; value-level scoring parity is the DuckDB oracle's job.
"""

from __future__ import annotations

import pyspark.sql.functions as F

from fletcher_spark.queries import registry
from tests.conftest import SF_DIR

registry.load_all()


def test_phrase_counts_overlapping_chains(spark):
    """'hash join hash join' contains the phrase TWICE positionally;
    non-overlapping substring counting of ' hash join ' would find one.
    Runs the registered query's own join (phrase_hits) on a planted frame."""
    from fletcher_spark.queries.search import _PHRASE, phrase_hits

    rows = [
        (1, "hash join hash join"),
        (2, "hash join end"),
        (3, "join hash"),
        (4, "nothing here"),
    ]
    d = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r["doc_id"]: r["n_hits"] for r in phrase_hits(d, _PHRASE).collect()}
    assert got == {1: 2, 2: 1}


def test_bm25_top10_is_ranked_descending(spark):
    rows = registry.QUERIES["search_bm25_topk"](spark, SF_DIR).collect()
    assert len(rows) == 10
    scores = [r["bm25"] for r in rows]
    assert scores == sorted(scores, reverse=True)
    assert all(s > 0 for s in scores)


def test_phrase_query_matches_naive_scan(spark):
    """Registered query result == per-document array scan computed
    independently in Spark (the oracle's algorithm, run on the engine
    under test)."""
    from fletcher_spark.io import load_tables
    from fletcher_spark.queries.search import _PHRASE

    got = {
        (r["doc_id"], r["n_hits"])
        for r in registry.QUERIES["search_phrase_positional"](
            spark, SF_DIR
        ).collect()
    }
    d = load_tables(spark, SF_DIR)["documents"]
    ws = F.split("text", " ")
    hits = F.size(
        F.filter(
            F.sequence(F.lit(0), F.size(ws) - 2),
            lambda i: (F.element_at(ws, i + 1) == _PHRASE[0])
            & (F.element_at(ws, i + 2) == _PHRASE[1]),
        )
    )
    want = {
        (r["doc_id"], r["n"])
        for r in d.select("doc_id", hits.alias("n")).filter(F.col("n") > 0).collect()
    }
    assert got == want


def test_hybrid_rrf_fuses_both_legs(spark):
    """The fused top-10 must descend in rrf with a doc_id tiebreak and
    score every doc within the achievable RRF bounds (two-leg max is
    1/61 + 1/61); value-level leg correctness is the oracle's job."""
    rows = registry.QUERIES["search_hybrid_rrf"](spark, SF_DIR).collect()
    assert len(rows) == 10
    scores = [r["rrf"] for r in rows]
    assert scores == sorted(scores, reverse=True)
    # bounds: best possible = 1/61 + 1/61, worst listed > 0
    assert scores[0] <= round(2 / 61, 6) + 1e-9
    assert scores[-1] > 0

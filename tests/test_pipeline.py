"""Semantic tests for the LLM-pipeline operators: beyond oracle value
parity (tests/test_oracle_contract.py), assert the *algorithms* do
their job — LSH finds the planted near-duplicates, ANN recall against
the exact baseline is sane."""

from __future__ import annotations

import duckdb
import pytest

from fletcher_spark.queries import registry
from tests.conftest import SF_DIR

registry.load_all()


@pytest.fixture(scope="module")
def brute_pairs():
    """All-pairs shingle Jaccard ≥ 0.5 via DuckDB — ground truth the
    LSH path must recover (O(n²), test-only, sf0.001)."""
    con = duckdb.connect()
    con.sql(
        f"CREATE VIEW documents AS SELECT * FROM '{SF_DIR}/documents.parquet'"
    )
    rows = con.sql(
        """
WITH tok AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
sh AS (
  SELECT doc_id, list_distinct(list_transform(range(1, len(toks) - 1),
         i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2])) AS s
  FROM tok WHERE len(toks) >= 3
)
SELECT a.doc_id, b.doc_id
FROM sh a JOIN sh b ON a.doc_id < b.doc_id
WHERE len(list_intersect(a.s, b.s))::DOUBLE
      / len(list_distinct(list_concat(a.s, b.s))) >= 0.5
"""
    ).fetchall()
    return {(r[0], r[1]) for r in rows}


def test_minhash_lsh_finds_planted_pairs(spark, brute_pairs):
    got = {
        (r["id1"], r["id2"])
        for r in registry.QUERIES["dedup_minhash_lsh"](spark, SF_DIR).collect()
    }
    assert len(brute_pairs) >= 20  # the generator plants near-dups
    # banded (4,3) LSH at J≥0.9 has miss probability < 1e-4 per pair
    recall = len(got & brute_pairs) / len(brute_pairs)
    assert recall == 1.0, f"LSH missed pairs: {brute_pairs - got}"
    # verification step removes every false positive
    assert got <= brute_pairs


def test_simhash_agrees_with_minhash_on_planted_pairs(spark, brute_pairs):
    got = {
        (r["id1"], r["id2"])
        for r in registry.QUERIES["dedup_simhash_pairs"](spark, SF_DIR).collect()
    }
    # simhash(hamming≤8) is a different sketch; planted J≥0.9 pairs land
    # at Hamming 1-10 over these ~90-shingle docs, so a small tail (d>8)
    # is legitimately out of reach — require the bulk
    recall = len(got & brute_pairs) / len(brute_pairs)
    assert recall >= 0.8, f"simhash recall {recall}"


def test_simhash128_recall_on_planted_pairs(spark, brute_pairs):
    """128-bit SimHash (16-bit chunks) must recover the planted
    near-dups at least as well as the 64-bit signature: same relative
    Hamming threshold (16/128 = 8/64), finer buckets — the widening
    changes candidate-set SIZE, not which true pairs are reachable."""
    got64 = {
        (r["id1"], r["id2"])
        for r in registry.QUERIES["dedup_simhash_pairs"](spark, SF_DIR).collect()
    }
    got128 = {
        (r["id1"], r["id2"])
        for r in registry.QUERIES["dedup_simhash128_pairs"](spark, SF_DIR).collect()
    }
    recall = len(got128 & brute_pairs) / len(brute_pairs)
    recall64 = len(got64 & brute_pairs) / len(brute_pairs)
    assert recall >= 0.8, f"simhash128 recall {recall}"
    assert recall >= recall64 - 0.1, (recall, recall64)


def test_ann_int8_rescore_tracks_float_ivf(spark):
    """The int8 first pass plus exact rescore must land (almost) the
    same top-3 as the all-float IVF probe: quantization noise only
    reorders candidates the rescore stage re-ranks exactly, so any gap
    means candidates were cut too early (ark<=10 too tight) or the
    integer scoring is wrong."""
    f32 = {
        (r["query_id"], r["neighbor_id"])
        for r in registry.QUERIES["ann_ivf_probe"](spark, SF_DIR).collect()
    }
    i8 = {
        (r["query_id"], r["neighbor_id"])
        for r in registry.QUERIES["ann_ivf_int8_rescore"](spark, SF_DIR).collect()
    }
    assert len(f32) > 0
    recall = len(i8 & f32) / len(f32)
    assert recall >= 0.9, f"int8 rescore recall vs float IVF: {recall}"


def test_ann_lsh_recall_vs_exact(spark):
    exact = registry.QUERIES["ann_cosine_topk"](spark, SF_DIR).collect()
    approx = registry.QUERIES["ann_lsh_bucketed"](spark, SF_DIR).collect()
    exact_top3 = {
        (r["query_id"], r["neighbor_id"]) for r in exact if r["rk"] <= 3
    }
    got = {(r["query_id"], r["neighbor_id"]) for r in approx}
    assert len(got) > 0
    # the synthetic embeddings are near-uniform (best cosine ≈ 0.35, no
    # tight clusters), the hardest regime for LSH — multi-table (4×4)
    # still has to beat random candidate sampling by a wide margin
    recall = len(got & exact_top3) / len(exact_top3)
    assert recall >= 0.25, f"LSH ANN recall {recall}"


def test_ann_ivf_recall_vs_exact(spark):
    exact = registry.QUERIES["ann_cosine_topk"](spark, SF_DIR).collect()
    ivf = registry.QUERIES["ann_ivf_probe"](spark, SF_DIR).collect()
    exact_top3 = {(r["query_id"], r["neighbor_id"]) for r in exact if r["rk"] <= 3}
    got = {(r["query_id"], r["neighbor_id"]) for r in ivf}
    recall = len(got & exact_top3) / len(exact_top3)
    # the synthetic labels are NOT geometric clusters (nearest-neighbor
    # labels are uncorrelated with the query label), so probing 2/10
    # lists bounds expected recall near 0.2 — assert the mechanism works
    # (non-empty, genuine cosines, better than a single random list)
    assert recall >= 0.1, f"IVF recall {recall}"

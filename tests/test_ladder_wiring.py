"""Unit-level wiring pins for every adaptive-granularity CASE ladder.

The scale tier value-checks the branches real corpora reach (two
widened widths per width-ladder family at .tmp/sf1 and .tmp/sf10, the
3×4 band rung at both) — but each ladder also has branches NO
generated corpus reaches: the max_bits ELSE needs > target·2^(max-1)
rows (e.g. > 524 288 vectors for the 16-bit embedding-dedup keys), and
intermediate widths between the two checked ones are selected only at
in-between corpus sizes.  This file pins the CASE *arithmetic* of
every branch of every ladder at exact integer boundaries, evaluated by
BOTH engines — so a threshold typo, an off-by-one at a power of two,
or a Spark/DuckDB integer-comparison divergence fails a unit test, not
a future scale run.

(The band-layout ladder's equivalent rung-wiring test lives in
tests/test_dedup_property.py::test_adaptive_band_rungs_match_explicit_
layouts.)
"""

from __future__ import annotations

import duckdb
import pytest

from fletcher_spark.pipeline.similarity import bits_case_sql

#: every width ladder in the repo: (name, target, min_bits, max_bits)
LADDERS = [
    # ann_lsh_bucketed table keys (queries/similarity.py:_bits_case)
    ("ann_bucket", 128, 4, 16),
    # dedup_embedding_cosine table keys (queries/dedup.py:_emb_bits_case)
    ("emb_dedup", 16, 8, 16),
    # IVF list sub-shards / knn blocks (queries/similarity.py)
    ("ivf_subshard", 2500, 0, 8),
]


def _expected_bits(n: int, target: int, min_bits: int, max_bits: int) -> int:
    """Independent reference: smallest b in [min_bits, max_bits] with
    n <= target * 2**b, clamped to max_bits."""
    for b in range(min_bits, max_bits + 1):
        if n <= target * (1 << b):
            return b
    return max_bits


def _boundary_counts(target: int, min_bits: int, max_bits: int) -> list[int]:
    """The counts where the CASE can go wrong: both sides of every
    threshold (exact power-of-two edges included), 1, and a count past
    the last WHEN (the ELSE branch)."""
    ns = [1]
    for b in range(min_bits, max_bits):
        edge = target * (1 << b)
        ns += [edge, edge + 1]
    ns.append(target * (1 << max_bits) * 3)  # deep in the ELSE
    return ns


@pytest.mark.parametrize("name,target,min_bits,max_bits", LADDERS)
def test_width_ladder_branches_match_both_engines(
    spark, name, target, min_bits, max_bits
):
    case = bits_case_sql("{n}", target, min_bits, max_bits)
    duck = duckdb.connect()
    ns = _boundary_counts(target, min_bits, max_bits)
    # one SELECT per engine for ALL boundary counts (driver round-trips
    # dominate a per-count loop)
    spark_sql = "SELECT " + ", ".join(
        case.format(n=n) + f" AS b{i}" for i, n in enumerate(ns)
    )
    got_spark = spark.sql(spark_sql).collect()[0]
    got_duck = duck.sql(spark_sql).fetchone()
    for i, n in enumerate(ns):
        want = _expected_bits(n, target, min_bits, max_bits)
        assert got_spark[i] == want, (name, n, got_spark[i], want)
        assert got_duck[i] == want, (name, n, got_duck[i], want)

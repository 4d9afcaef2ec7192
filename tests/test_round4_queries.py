"""Semantic invariants for the round-4/5 query additions — properties
the DuckDB oracle comparison cannot express (it would be wrong in the
same way), checked directly."""

from __future__ import annotations

from pyspark.sql import functions as F

from fletcher_spark.io import load_tables
from fletcher_spark.queries import registry
from tests.conftest import SF_DIR

registry.load_all()


def test_winsorize_clamps_within_band(spark):
    out = {r["source"]: r for r in registry.QUERIES["winsorize_doc_lengths"](spark, SF_DIR).collect()}
    for r in out.values():
        assert r["p05"] <= r["p95"]
        # the winsorized mean sits inside the clamp band, the raw mean
        # need not
        assert r["p05"] - 1e-9 <= r["avg_winsor"] <= r["p95"] + 1e-9


def test_hybrid_filter_subset_of_quality_docs(spark):
    t = load_tables(spark, SF_DIR)
    kept = registry.QUERIES["hybrid_text_embed_filter"](spark, SF_DIR).agg(
        F.sum("n_kept")
    ).collect()[0][0]
    quality_with_vec = (
        t["documents"]
        .filter((F.col("n_chars") >= 150) & F.col("lang").isin("en", "de"))
        .join(t["embeddings"], F.col("doc_id") == F.col("vec_id"))
        .count()
    )
    assert kept == quality_with_vec


def test_tfidf_ranks_are_dense_per_doc(spark):
    rows = registry.QUERIES["tfidf_doc_topk"](spark, SF_DIR).collect()
    by_doc: dict[int, list[int]] = {}
    for r in rows:
        by_doc.setdefault(r["doc_id"], []).append(r["rk"])
        assert r["tf"] >= 1 and r["df"] >= 1
    for doc, rks in by_doc.items():
        assert sorted(rks) == list(range(1, len(rks) + 1)), doc


def test_snapshot_diff_partitions_the_key_space(spark):
    out = {r["change"]: r for r in registry.QUERIES["snapshot_diff"](spark, SF_DIR).collect()}
    d = load_tables(spark, SF_DIR)["documents"]
    n_old = d.filter(F.col("doc_id") % 7 != 0).count()
    n_new = d.filter(F.col("doc_id") % 5 != 0).count()
    n_removed = out["removed"]["n_docs"] if "removed" in out else 0
    n_added = out["added"]["n_docs"] if "added" in out else 0
    n_common = sum(
        out[c]["n_docs"] for c in ("changed", "unchanged") if c in out
    )
    assert n_old == n_removed + n_common
    assert n_new == n_added + n_common
    # changed rows differ by construction: doc_id % 3 == 0 shifts chars
    if "changed" in out:
        assert out["changed"]["sum_new"] == out["changed"]["sum_old"] + 10 * out["changed"]["n_docs"]


def test_levenshtein_pairs_are_blocked_and_symmetric_free(spark):
    rows = registry.QUERIES["dedup_levenshtein_block"](spark, SF_DIR).collect()
    assert rows, "planted near-dups must produce pairs"
    seen = set()
    for r in rows:
        assert r["id_a"] < r["id_b"]  # canonical orientation, no mirror pair
        assert 0 <= r["dist"] <= 20
        assert (r["id_a"], r["id_b"]) not in seen
        seen.add((r["id_a"], r["id_b"]))


def test_levenshtein_adaptive_block_split(spark, tmp_path):
    """Blocks over _LEV_BLOCK_CAP re-block on the 16-char prefix
    (adaptive block splitting — the r7 scale-probe fix for fixed-key
    saturation).  An oversized planted block must split into 16-char
    sub-blocks (no cross-sub-block pairs); a sub-cap corpus must
    reproduce the flat 8-char scheme bit-for-bit."""
    import fletcher_spark.queries.dedup as QD

    cap = QD._LEV_BLOCK_CAP
    # one 8-char block of cap+2 docs: two 16-char sub-prefixes, each
    # internally identical -> pairs only within a sub-block
    half = (cap + 2) // 2
    rows = [(i, f"PREFIX__sub_A___tail number {i}") for i in range(half)]
    rows += [(1000 + i, f"PREFIX__sub_B___tail number {i}") for i in range(cap + 2 - half)]
    # plus a sub-cap block pair that must keep flat-scheme behavior
    rows += [(5000, "tiny blk x"), (5001, "tiny blk y")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    df.coalesce(1).write.mode("overwrite").parquet(str(tmp_path / "documents.parquet"))
    got = registry.QUERIES["dedup_levenshtein_block"](spark, str(tmp_path)).collect()
    pairs = {(r["id_a"], r["id_b"]) for r in got}
    # no pair may span the A/B sub-blocks
    assert all((a < 1000) == (b < 1000) or a >= 5000 for a, b in pairs), sorted(pairs)[:5]
    # within-sub-block pairs survive, as does the sub-cap tiny block
    assert any(a < 1000 and b < 1000 for a, b in pairs)
    assert any(a >= 1000 and a < 5000 for a, b in pairs) or any(
        b >= 1000 and b < 5000 for a, b in pairs
    )
    assert (5000, 5001) in pairs  # flat scheme intact below the cap


def test_levenshtein_cascade_deep_levels(spark, tmp_path, monkeypatch):
    """Blocks oversized at 8 AND 16 chars cascade to the 32-char level,
    and blocks sharing the full 60-char compare prefix land in the
    uncapped final level where every pair is a genuine distance-0
    output.  Cap monkeypatched small so each level is exercised with a
    handful of docs."""
    import fletcher_spark.queries.dedup as QD

    monkeypatch.setattr(QD, "_LEV_BLOCK_CAP", 4)
    base32 = "PREFIX__16chars_-32charsXXXXXXX_"  # 32 chars
    assert len(base32) == 32
    rows = []
    # 6 docs sharing blk8+blk16, split 3/3 within chars 17-32 (each
    # group's 32-char prefix identical, tails differ) -> level-3 keys
    rows += [(i, "PREFIX__16chars_A_group_pad_____ tail %d" % i) for i in range(3)]
    rows += [(10 + i, "PREFIX__16chars_B_group_pad_____ tail %d" % i) for i in range(3)]
    # 6 docs sharing the FULL 60-char prefix -> final level, all pairs
    ident = base32 + "same_same_same_same_same_ta "  # 60 chars
    rows += [(100 + i, ident + "uniq%d" % i) for i in range(6)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    df.coalesce(1).write.mode("overwrite").parquet(str(tmp_path / "documents.parquet"))
    got = registry.QUERIES["dedup_levenshtein_block"](spark, str(tmp_path)).collect()
    pairs = {(r["id_a"], r["id_b"]): r["dist"] for r in got}
    # level-3 split: no A-B cross pairs, within-group pairs kept
    assert all((a < 10) == (b < 10) for a, b in pairs if a < 100), pairs
    assert any(a < 10 and b < 10 for a, b in pairs)
    assert any(10 <= a < 100 and 10 <= b < 100 for a, b in pairs)
    # final level: all 15 identical-prefix pairs present at distance 0
    fin = {(a, b): d for (a, b), d in pairs.items() if a >= 100}
    assert len(fin) == 15 and set(fin.values()) == {0}, fin


def test_range_join_follows_bucket_boundaries(spark, tmp_path):
    """The r8 time-bucket binning must be invisible in the results:
    followers exactly at t1 + 5min (inclusive bound, lands in bucket
    b+1 when t1 is bucket-aligned), followers crossing a bucket edge,
    same-timestamp non-followers (strict >), and pairs within one
    bucket must all match the unbinned definition with no duplicates
    from the {b, b+1} explode."""
    import datetime as dt

    five_min = 300 * 1_000_000  # µs
    base = dt.datetime(2024, 1, 7, 0, 0, 0)  # bucket-aligned epoch

    def at(us):
        return base + dt.timedelta(microseconds=us)

    rows = [
        # u1: follower exactly at +5min (inclusive, next bucket) and a
        # same-ts event (strict >, excluded)
        (1, at(0), 10, "lead", 0.0, None),
        (2, at(five_min), 10, "lead", 0.0, None),
        (3, at(0), 10, "lead", 0.0, None),
        # u2: pair crossing a bucket edge (b ends at +5min) but within
        # range; plus one past the range (+5min 1µs after the first)
        (4, at(five_min - 1), 20, "edge", 0.0, None),
        (5, at(five_min + 1), 20, "edge", 0.0, None),
        (6, at(2 * five_min), 20, "edge", 0.0, None),
        # u3: both inside one bucket
        (7, at(10), 30, "same", 0.0, None),
        (8, at(20), 30, "same", 0.0, None),
        # u4: far apart — no pair
        (9, at(0), 40, "far", 0.0, None),
        (10, at(10 * five_min), 40, "far", 0.0, None),
    ]
    df = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, event_type string, value double, props string"
    )
    df.coalesce(1).write.mode("overwrite").parquet(str(tmp_path / "events.parquet"))
    got = {
        r["lead_type"]: r["n_follow"]
        for r in registry.QUERIES["range_join_follows"](spark, str(tmp_path)).collect()
    }
    # lead: (1→2) and (3→2) at exactly +5min, NOT (1↔3) same-ts
    # edge: (4→5) within range crossing the bucket edge, (5→6) within
    #       range, NOT (4→6) at +5min+1µs
    # same: (7→8); far: nothing
    assert got == {"lead": 2, "edge": 2, "same": 1}, got


def test_pagerank_is_a_distribution(spark):
    rows = registry.QUERIES["pagerank_nation_trade"](spark, SF_DIR).collect()
    n = len(rows)
    total = sum(r["pagerank"] for r in rows)
    # stochastic graph with no dangling sources (every nation that
    # appears as src has out-edges by construction) → mass ≈ 1; rounding
    # of 25 six-decimal values bounds the drift
    assert abs(total - 1.0) < 1e-3, total
    assert all(r["pagerank"] > 0 for r in rows)
    assert n == load_tables(spark, SF_DIR)["nation"].count()


def test_transition_matrix_rows_normalize(spark):
    rows = registry.QUERIES["events_transition_matrix"](spark, SF_DIR).collect()
    by_prev: dict[str, float] = {}
    for r in rows:
        by_prev[r["prev_type"]] = by_prev.get(r["prev_type"], 0.0) + r["prob"]
        assert r["n_transitions"] >= 1
    for prev, s in by_prev.items():
        assert abs(s - 1.0) < 1e-4, (prev, s)


def test_mad_outliers_bounded_by_group(spark):
    out = registry.QUERIES["mad_outlier_docs"](spark, SF_DIR).collect()
    for r in out:
        assert 0 <= r["n_outliers"] <= r["n_docs"]
        assert r["mad"] >= 0
        if r["n_outliers"] == 0:
            assert r["first_outlier"] is None


def test_chi2_contributions_nonnegative(spark):
    out = registry.QUERIES["corpus_drift_chi2"](spark, SF_DIR).collect()
    assert sum(r["n_docs"] for r in out) == load_tables(spark, SF_DIR)["documents"].count()
    assert all(r["chi2_contrib"] >= 0 for r in out)


def test_profile_documents_exact_distincts(spark):
    out = {r["column"]: r for r in registry.QUERIES["profile_documents"](spark, SF_DIR).collect()}
    d = load_tables(spark, SF_DIR)["documents"]
    assert out["doc_id"]["n_distinct"] == d.count()  # unique key
    assert out["lang"]["n_distinct"] == d.select("lang").distinct().count()


def test_skew_report_shares_sum_below_one(spark):
    out = registry.QUERIES["skew_report_lineitem"](spark, SF_DIR).collect()
    assert len(out) == 10
    assert sum(r["share"] for r in out) <= 1.0 + 1e-6
    assert all(out[i]["n_rows"] >= out[i + 1]["n_rows"] for i in range(9))

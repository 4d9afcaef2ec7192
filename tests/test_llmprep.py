"""Semantic tests for the round-4 LLM-prep operators: beyond oracle
value parity (tests/test_oracle_contract.py), assert the algorithms do
their job — planted boilerplate is flagged, prefix-duplicates group,
caps cap, kNN ranks order, cluster membership conserves."""

from __future__ import annotations

import os

import pytest

from fletcher_spark.queries import registry
from tests.conftest import SF_DIR

registry.load_all()


@pytest.fixture(scope="module")
def planted_dir(tmp_path_factory):
    """A documents.parquet with planted boilerplate and prefix dups:
    docs 0-3 share an 8-token boilerplate sentence (>=3-doc threshold),
    doc 4 is fully unique, docs 5-6 share a 64-char prefix."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    boiler = "alpha beta gamma delta epsilon zeta eta theta"
    uniq = [
        "one red fox jumps over the lazy dog tonight quickly",
        "two blue birds sing in the old oak tree today",
        "three green frogs hop across the quiet pond at dawn",
        "four black cats sleep on the warm stone wall outside",
    ]
    prefix = "p" * 64
    texts = [f"{boiler} {u}" for u in uniq]  # docs 0-3: boiler + unique tail
    texts.append("five white owls watch from the tall dark pine silently")  # doc 4
    texts.append(prefix + " tail one is here")  # doc 5
    texts.append(prefix + " tail two differs")  # doc 6
    tbl = pa.table(
        {
            "doc_id": pa.array(range(7), pa.int64()),
            "text": pa.array(texts, pa.string()),
            "lang": pa.array(["en"] * 7, pa.string()),
            "source": pa.array(["srcA"] * 4 + ["srcB"] * 3, pa.string()),
            "n_chars": pa.array([len(t) for t in texts], pa.int64()),
        }
    )
    d = tmp_path_factory.mktemp("planted")
    pq.write_table(tbl, os.path.join(str(d), "documents.parquet"))
    return str(d)


def test_boilerplate_flags_planted_shingles(spark, planted_dir):
    rows = {
        r["doc_id"]: r.asDict()
        for r in registry.QUERIES["text_boilerplate_ratio"](spark, planted_dir).collect()
    }
    # docs 0-3 share the 8-token boilerplate opener -> exactly one
    # boilerplate shingle position each (the sentence appears once per doc)
    for d in range(4):
        assert rows[d]["n_boiler"] >= 1, f"doc {d} boilerplate not flagged"
        assert 0.0 < rows[d]["boiler_ratio"] <= 1.0
    # doc 4 shares nothing -> ratio 0
    assert rows[4]["n_boiler"] == 0 and rows[4]["boiler_ratio"] == 0.0
    for r in rows.values():
        assert 0 <= r["n_boiler"] <= r["n_shingles"]


def test_prefix_dedup_groups_planted_pair(spark, planted_dir):
    rows = registry.QUERIES["dedup_prefix_hash"](spark, planted_dir).collect()
    assert len(rows) == 1, "exactly one planted prefix-dup group expected"
    assert rows[0]["n_docs"] == 2 and rows[0]["keeper"] == 5


def test_sample_cap_enforced_and_deterministic(spark):
    q = registry.QUERIES["sample_k_per_group"]
    a = sorted(map(tuple, q(spark, SF_DIR).collect()))
    b = sorted(map(tuple, q(spark, SF_DIR).collect()))
    assert a == b, "per-group sample must be deterministic"
    per_group: dict[str, int] = {}
    for src, _doc, rk in a:
        per_group[src] = per_group.get(src, 0) + 1
        assert 1 <= rk <= 5
    assert all(n <= 5 for n in per_group.values())


def test_knn_graph_rank_order_and_block_locality(spark):
    out = registry.QUERIES["knn_graph_blocked"](spark, SF_DIR).collect()
    by_vec: dict[int, dict[int, tuple]] = {}
    for r in out:
        by_vec.setdefault(r["vec_id"], {})[r["rk"]] = (r["nbr_id"], r["cos"])
    assert len(by_vec) > 0
    labels = {
        r["vec_id"]: r["label"]
        for r in spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
        .select("vec_id", "label")
        .collect()
    }
    for vid, ranks in by_vec.items():
        if 1 in ranks and 2 in ranks:
            assert ranks[1][1] >= ranks[2][1], f"vec {vid}: rank-1 cos < rank-2"
        for nbr, _ in ranks.values():
            assert labels[nbr] == labels[vid], "neighbor outside block"
            assert nbr != vid


def test_semdedup_rep_membership_and_conservation(spark):
    out = registry.QUERIES["semdedup_centroid"](spark, SF_DIR).collect()
    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    labels = {r["vec_id"]: r["label"] for r in emb.select("vec_id", "label").collect()}
    assert sum(r["n_members"] for r in out) == len(labels)
    for r in out:
        assert labels[r["rep_id"]] == r["label"], "representative outside its cluster"
        assert r["rep_d2"] >= 0


def test_mix_weights_sum_to_one(spark):
    out = registry.QUERIES["mix_temperature_sampling"](spark, SF_DIR).collect()
    total = sum(r["weight"] for r in out)
    assert abs(total - 1.0) < 1e-3
    assert all(r["alloc"] >= 0 for r in out)
    assert sum(r["alloc"] for r in out) <= 1000


def test_weighted_aes_sample_biases_toward_weight(spark):
    """A-ES sample semantics: the length-weighted sample's average
    n_chars must exceed the corpus average (long docs are favored),
    and the draw is reproducible run to run."""
    import pyspark.sql.functions as F

    from fletcher_spark.io import load_tables
    from tests.conftest import SF_DIR

    registry.load_all()
    a = registry.QUERIES["sample_weighted_aes"](spark, SF_DIR).collect()
    b = registry.QUERIES["sample_weighted_aes"](spark, SF_DIR).collect()
    assert sorted(r["doc_id"] for r in a) == sorted(r["doc_id"] for r in b)
    sample_mean = sum(r["n_chars"] for r in a) / len(a)
    corpus_mean = (
        load_tables(spark, SF_DIR)["documents"]
        .agg(F.avg("n_chars"))
        .collect()[0][0]
    )
    assert sample_mean > corpus_mean, (
        f"length-weighted sample mean {sample_mean} must exceed corpus "
        f"mean {corpus_mean}"
    )

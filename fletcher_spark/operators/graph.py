"""Iterative graph operators (connected components for dedup clusters).

The reference has no graph surface at all; this exists because near-dup
deduplication NEEDS it: pairwise MinHash/SimHash hits form chains
(a~b, b~c) that must collapse to one representative, and a pairwise
keep-min policy gets chains wrong.  SURVEY.md §2.8 notes iterative
algorithms are the one family Catalyst cannot express in a single plan;
the driver-side loop below runs O(component-diameter) distributed
rounds, never collecting data (only a 1-row convergence scalar).

Scale (100 TB): the vertex set is the *candidate-pair* vertex set —
orders of magnitude smaller than the corpus — and each round is one
shuffle keyed on vertex id.  For adversarial long-chain graphs switch
the round body to the large-star/small-star rewrite (same loop shape,
provably O(log n) rounds); near-dup clusters are shallow so hash-min
is the right default.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def connected_components(
    edges: DataFrame, src: str = "id1", dst: str = "id2", max_rounds: int = 15
) -> DataFrame:
    """Label every vertex of the undirected edge list with the minimum
    vertex id reachable from it (hash-min label propagation).

    Returns a DataFrame (id, label).  Labels only ever decrease, so an
    unchanged SUM(label) is a fixpoint — one 1-row action per round
    instead of a join + count of changed rows.
    """
    e = edges.select(F.col(src).alias("id1"), F.col(dst).alias("id2")).persist()
    # Size the iteration graph to the data: the verified edge set is
    # ≪ corpus by construction, and a fixed shuffle-partition count
    # would give every round |parts| near-empty tasks.  ~2M edges per
    # partition keeps rounds dense at any scale (the count() also
    # materializes the persist exactly once).
    parts = max(1, -(-e.count() // 2_000_000))
    sym = (
        e.union(e.select(F.col("id2").alias("id1"), F.col("id1").alias("id2")))
        .union(  # self-loops: closed neighborhood ⇒ one join per round
            e.select("id1", F.col("id1").alias("id2"))
            .union(e.select(F.col("id2").alias("id1"), "id2"))
            .distinct()
        )
        .repartition(parts, "id2")
        .persist()
    )
    labels = (
        sym.select(F.col("id1").alias("id"))
        .distinct()
        .withColumn("label", F.col("id"))
        .repartition(parts, "id")
        .persist()
    )

    prev = None
    for _ in range(max_rounds):
        nxt = (
            sym.join(labels, sym["id2"] == labels["id"])
            .groupBy(sym["id1"].alias("id"))
            .agg(F.min("label").alias("label"))
        ).persist()
        cur = nxt.agg(F.sum("label")).collect()[0][0]
        labels.unpersist()
        labels = nxt
        if cur == prev:
            break
        prev = cur

    e.unpersist()
    return labels

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
from pyspark.sql import types as T

#: Edge count below which components are solved with driver-side
#: union-find instead of iterative distributed rounds.  Same gating
#: principle as Spark's broadcast-join threshold: 4M edges is ~64 MB
#: of int64 pairs — trivial for the driver, while each distributed
#: round costs a full job (join + shuffle + action).  The edge set
#: here is the *verified near-dup pair* set, orders of magnitude
#: smaller than the corpus, so at 100 TB this gate still usually
#: fires; the iterative path below is the correctness backstop for
#: adversarial pair explosions.
LOCAL_EDGE_LIMIT = 4_000_000


def _local_union_find(e: DataFrame) -> DataFrame:
    """Union-find over a collected edge list → (id, label=min id of
    component).  O(E α(E)) on the driver; only reached under
    LOCAL_EDGE_LIMIT."""
    parent: dict = {}

    def find(x):
        root = x
        while parent[root] != root:
            root = parent[root]
        while parent[x] != root:  # path compression
            parent[x], x = root, parent[x]
        return root

    for id1, id2 in e.collect():
        if id1 not in parent:
            parent[id1] = id1
        if id2 not in parent:
            parent[id2] = id2
        r1, r2 = find(id1), find(id2)
        if r1 != r2:
            # union by min so the final label IS the component min
            if r2 < r1:
                r1, r2 = r2, r1
            parent[r2] = r1
    rows = [(x, find(x)) for x in parent]
    id_type = e.schema[0].dataType
    schema = T.StructType(
        [T.StructField("id", id_type, False), T.StructField("label", id_type, False)]
    )
    return e.sparkSession.createDataFrame(rows, schema)


def connected_components(
    edges: DataFrame,
    src: str = "id1",
    dst: str = "id2",
    max_rounds: int = 15,
    local_edge_limit: int = LOCAL_EDGE_LIMIT,
) -> DataFrame:
    """Label every vertex of the undirected edge list with the minimum
    vertex id reachable from it.

    Small edge sets (≤ ``local_edge_limit``) are solved with
    driver-side union-find — one collect of the (already pair-verified,
    corpus-decimated) edge list beats O(diameter) distributed jobs by
    ~10× wall; the threshold mirrors broadcast-join size gating.
    Larger sets run hash-min label propagation: distributed rounds,
    never collecting data (only a 1-row convergence scalar).

    Returns a DataFrame (id, label).  Labels only ever decrease, so an
    unchanged SUM(label) is a fixpoint — one 1-row action per round
    instead of a join + count of changed rows.
    """
    e = edges.select(F.col(src).alias("id1"), F.col(dst).alias("id2")).persist()
    n_edges = e.count()  # also materializes the persist exactly once
    if n_edges <= local_edge_limit:
        out = _local_union_find(e)
        e.unpersist()
        return out
    # Size the iteration graph to the data: a fixed shuffle-partition
    # count would give every round |parts| near-empty tasks.  ~2M edges
    # per partition keeps rounds dense at any scale.
    parts = max(1, -(-n_edges // 2_000_000))
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

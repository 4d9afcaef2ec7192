"""Lloyd k-means over embedding columns — the IVF list-training step.

The reference has no clustering; this exists because the similarity
stack's IVF probe (queries/similarity.py:ann_ivf_probe) needs a coarse
quantizer, and "train k lists with a few Lloyd rounds" is the standard
way to get one at 100 TB.

Shape: each round materializes the k×dim centroid table to the driver
and re-broadcasts it (the MLlib KMeans pattern — centroids are MODEL
state, O(k·dim) regardless of corpus size, so this is metadata
movement, not a data collect; leaving the rounds lazy instead chains
every round's DAG into the next assign and recomputes the whole
history per round).  Each round is:

- assign: |v| × k broadcast nested-loop (centroids are k×dim doubles,
  always broadcastable), argmin via a per-vector window over k rows;
- recompute: posexplode → (cid, pos)-keyed partial+final average →
  in-group repack.  Nothing ever shuffles the vectors themselves except
  the k-row-per-vector argmin window, keyed on vec id.

Distance math is the same double-cast ``zip_with``/``aggregate`` folds
as pipeline/similarity.py — engine-portable, so the whole trainer is
value-checkable against a SQL oracle.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def l2sq(a: Column, b: Column) -> Column:
    """Squared euclidean distance: aggregate(zip_with(a,b,(x-y)²), 0, +)."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: (x - y) * (x - y)),
        F.lit(0.0),
        lambda acc, z: acc + z,
    )


def assign_nearest(
    v: DataFrame, cent: DataFrame, id_col: str, vec_col: str
) -> DataFrame:
    """Assign every vector to its nearest centroid (ties → lowest cid).

    Returns (id_col, vec_col, cid, d2)."""
    a = v.crossJoin(F.broadcast(cent)).withColumn(
        "d2", l2sq(F.col(vec_col), F.col("cv"))
    )
    w = Window.partitionBy(id_col).orderBy("d2", "cid")
    return (
        a.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") == 1)
        .select(id_col, vec_col, "cid", "d2")
    )


def lloyd(
    v: DataFrame, id_col: str, vec_col: str, k: int, iters: int
) -> DataFrame:
    """Run ``iters`` Lloyd rounds from a deterministic init (the k
    lowest-id vectors) and return the final assignment
    (id_col, vec_col, cid, d2).

    Deterministic by construction: init is id-ordered, argmin ties
    break on cid, and centroid averages are order-insensitive — which
    is what makes the trainer cross-engine value-checkable.  Empty
    clusters simply drop out (matching the SQL replay).
    """
    w0 = Window.orderBy(id_col)  # k rows only — the LIMIT k result
    cent = (
        v.orderBy(id_col)
        .limit(k)
        .select(
            F.row_number().over(w0).cast("long").alias("cid"),
            F.col(vec_col).alias("cv"),
        )
    )

    def _pin(c: DataFrame) -> DataFrame:
        # centroids → driver → literal DataFrame: k×dim model state,
        # never corpus data; cuts the per-round DAG at the model
        rows = [(r["cid"], list(r["cv"])) for r in c.collect()]
        return v.sparkSession.createDataFrame(rows, "cid long, cv array<double>")

    cent = _pin(cent)
    for _ in range(iters):
        assign = assign_nearest(v, cent, id_col, vec_col)
        cdim = (
            assign.select("cid", F.posexplode(vec_col).alias("i", "val"))
            .groupBy("cid", "i")
            .agg(F.avg("val").alias("cv"))
        )
        cent = _pin(
            cdim.groupBy("cid").agg(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("i", "cv"))), lambda s: s["cv"]
                ).alias("cv")
            )
        )
    return assign_nearest(v, cent, id_col, vec_col)

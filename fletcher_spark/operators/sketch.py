"""Mergeable summary sketches as library operators.

The query-layer demonstrations live in queries/sketches.py; these are
the reusable cores a pipeline composes directly:

* :func:`cms_build` / :func:`cms_estimate` — Count-Min Sketch.  The
  built grid is a plain DataFrame of (j, bucket, c) cells, so merging
  shards or micro-batches is ``union → groupBy(j, bucket) → sum`` —
  the CMS merge is cell-wise addition, which Spark's map-side partial
  aggregation already performs inside a single build.
* :func:`bloom_build` / :func:`bloom_probe` — Bloom filter in
  distinct-set-bit-positions form: ≤ m rows, broadcastable, and
  mergeable by UNION (bitwise-OR of bitmaps == set union of
  positions).  No false negatives by construction.
* :func:`kmv_minima` / :func:`kmv_summary` / :func:`kmv_merge` /
  :func:`kmv_estimate` — k-minimum-values distinct-count sketch: the
  k smallest distinct hashes per group.  Merge = union the sketches
  and re-take the k smallest (lossless: every hash among a union's k
  smallest is among its own part's k smallest).  Deterministic under
  the md5 hash family — unlike HLL, identical estimates on any engine
  — which is what lets the query layer value-check it against DuckDB.

All hashing uses the repo-standard engine-portable family
``int(hexN(md5(seed | key)))``; every function is pure DataFrame-in /
DataFrame-out and free of driver-side state.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

#: 14 hex chars of md5 → 56-bit non-negative integer hash.
KMV_SCALE = 1 << 56


def portable_hash(seed, key: Column, mod: int, hex_chars: int = 8) -> Column:
    """Engine-portable hash: first ``hex_chars`` of md5(seed|key), as a
    long mod ``mod``.  Equals DuckDB's
    ``('0x' || substr(md5(seed || '|' || key::VARCHAR), 1, n))::BIGINT
    % mod``."""
    return (
        F.conv(
            F.substring(
                F.md5(F.concat(F.lit(str(seed)), F.lit("|"), key.cast("string"))),
                1,
                hex_chars,
            ),
            16,
            10,
        ).cast("long")
        % mod
    )


def _cells(key: Column, depth: int, width: int) -> Column:
    return F.explode(
        F.array(
            *[
                F.struct(
                    F.lit(j).alias("j"),
                    portable_hash(j, key, width).alias("bucket"),
                )
                for j in range(depth)
            ]
        )
    )


def cms_build(df: DataFrame, key_col: str, depth: int, width: int) -> DataFrame:
    """One-pass Count-Min grid: (j, bucket, c) with j < depth, bucket <
    width.  Map-side combine bounds the exchange at
    ``depth × width × n_partitions`` rows regardless of input size."""
    return (
        df.select(_cells(F.col(key_col), depth, width).alias("cell"))
        .select("cell.j", "cell.bucket")
        .groupBy("j", "bucket")
        .agg(F.count(F.lit(1)).alias("c"))
    )


def cms_estimate(
    cms: DataFrame, probes: DataFrame, key_col: str, depth: int, width: int
) -> DataFrame:
    """Point-estimate each probe key against a built grid:
    ``min_j c[j][hash_j(key)]`` — ≥ the true count always, equality
    unless every row of the grid collides.  ``probes`` columns are
    passed through."""
    pp = probes.withColumn("cell", _cells(F.col(key_col), depth, width)).select(
        *probes.columns, "cell.j", "cell.bucket"
    )
    # LEFT join + coalesce-to-0: a probe key absent from the stream has
    # empty grid cells, and the CMS estimate for it is min(..., 0) = 0 —
    # an inner join would silently drop such probes from the output.
    return (
        pp.join(F.broadcast(cms), ["j", "bucket"], "left")
        .groupBy(*probes.columns)
        .agg(F.min(F.coalesce(F.col("c"), F.lit(0))).alias("cms_est"))
    )


def bloom_build(df: DataFrame, key_col: str, m: int, k: int) -> DataFrame:
    """Bloom filter as the DISTINCT set of set bit positions (≤ m
    rows).  Merge filters built over different shards with UNION +
    distinct."""
    return (
        df.select(
            F.explode(
                F.array(*[portable_hash(j, F.col(key_col), m) for j in range(k)])
            ).alias("pos")
        )
        .distinct()
    )


def bloom_probe(
    bits: DataFrame, probes: DataFrame, key_col: str, m: int, k: int
) -> DataFrame:
    """Membership test: a probe is ``in_bloom`` iff all k of its
    positions are set.  Guaranteed true for every inserted key (no
    false negatives); false positives at the standard
    ``(1 - e^{-kn/m})^k`` rate, deterministic under the hash family.
    Duplicate probe rows collapse to one output row (the groupBy is on
    the probe columns) — set semantics, with the verdict per key
    correct regardless of multiplicity."""
    pp = probes.select(
        *probes.columns,
        F.explode(
            F.array(*[portable_hash(j, F.col(key_col), m) for j in range(k)])
        ).alias("pos"),
    )
    # min(hit)==1 ⇔ every position set.  (A sum-vs-k compare breaks on
    # duplicate probe rows: groupBy collapses them and the sum becomes
    # dup_count*k, yielding a false negative for an inserted key.)
    hits = (
        pp.join(F.broadcast(bits.withColumn("hit", F.lit(1))), "pos", "left")
        .groupBy(*probes.columns)
        .agg(F.min(F.coalesce(F.col("hit"), F.lit(0))).alias("allhit"))
    )
    return hits.select(*probes.columns, (F.col("allhit") == 1).alias("in_bloom"))


def kmv_hash(key: Column) -> Column:
    """The 56-bit KMV hash of a key (normalize by :data:`KMV_SCALE`)."""
    return (
        F.conv(F.substring(F.md5(key.cast("string")), 1, 14), 16, 10).cast("long")
    )


def kmv_minima(
    df: DataFrame, key_col: str, k: int, group_cols: tuple[str, ...] = ()
) -> DataFrame:
    """The KMV sketch itself: each group's k smallest DISTINCT hashes,
    as (group..., h) rows.  This is the state a shard or micro-batch
    pipeline carries — ≤ k longs per group."""
    d = df.select(*group_cols, kmv_hash(F.col(key_col)).alias("h")).distinct()
    if group_cols:
        w = Window.partitionBy(*group_cols).orderBy("h")
        return (
            d.withColumn("rk", F.row_number().over(w))
            .filter(F.col("rk") <= k)
            .select(*group_cols, "h")
        )
    # Ungrouped path: a bare Window.orderBy would funnel every distinct
    # hash through one task.  Pre-prune with a salted per-salt top-k
    # (any hash among the global k smallest is among its salt's k
    # smallest), then run the tiny global window over ≤ 32·k rows.
    salted = d.withColumn("_s", F.pmod(F.col("h"), F.lit(32)))
    per_salt = (
        salted.withColumn(
            "rk", F.row_number().over(Window.partitionBy("_s").orderBy("h"))
        )
        .filter(F.col("rk") <= k)
        .select("h")
    )
    return (
        per_salt.withColumn("rk", F.row_number().over(Window.orderBy("h")))
        .filter(F.col("rk") <= k)
        .select("h")
    )


def kmv_summary(
    minima: DataFrame, group_cols: tuple[str, ...] = ()
) -> DataFrame:
    """Collapse sketch rows to the (nk, hk) pair :func:`kmv_estimate`
    consumes."""
    aggs = [F.count(F.lit(1)).alias("nk"), F.max("h").alias("hk")]
    if group_cols:
        return minima.groupBy(*group_cols).agg(*aggs)
    return minima.agg(*aggs)


def kmv_merge(minima: DataFrame, k: int) -> DataFrame:
    """Merge per-group (or per-shard) sketches into one global sketch:
    union the hash sets, re-take the k smallest.  LOSSLESS — the k
    smallest hashes of a union are each among their own part's k
    smallest, so this equals the sketch built directly on the union."""
    return (
        minima.select("h")
        .distinct()
        .withColumn("rk", F.row_number().over(Window.orderBy("h")))
        .filter(F.col("rk") <= k)
        .select("h")
    )


def kmv_estimate(nk: Column, hk: Column, k: int) -> Column:
    """Distinct-count estimate from a sketch summary: exact when the
    group holds fewer than k distinct hashes, else ``(k−1)/u_k``."""
    return F.when(nk < k, nk.cast("double")).otherwise(
        F.round(F.lit(float(k - 1)) * KMV_SCALE / hk, 2)
    )

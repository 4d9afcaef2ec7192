"""Similarity search over embedding columns (LLM-pipeline extensions).

Brute-force cosine top-k as the correctness baseline, and
random-hyperplane (sign) LSH bucketing as the scale path.  All vector
math is Catalyst higher-order functions (``zip_with``/``aggregate``)
over ``array<float>`` — JVM codegen, no Python, no explode.

Cross-engine determinism: every element is cast to DOUBLE before any
arithmetic and folds run left-to-right from 0.0, so Spark and DuckDB
produce bit-identical sums; the LSH hyperplanes are ±1 matrices derived
from md5 at *build* time (plain Python, embedded as literals in both
the Spark plan and the oracle SQL).

Scale shape: brute force is a broadcast nested loop — O(|Q|·N) dot
products, the right plan when |Q| is small and N is sharded (each
executor scans its partition once).  LSH bucketing turns that into a
bucket-equi-join: shuffle keyed on an 8-bit code, each query compared
only to its bucket (≈ N/256 per probe).
"""

from __future__ import annotations

import hashlib
from functools import lru_cache

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = [
    "dot",
    "cosine",
    "l2_norm",
    "hyperplane_signs",
    "lsh_bucket",
    "brute_force_topk",
    "bits_case_sql",
]


def bits_case_sql(n_expr: str, target: int, min_bits: int, max_bits: int) -> str:
    """Integer-threshold CASE choosing the smallest LSH key width ``b``
    in [min_bits, max_bits] with ``n ≤ target·2^b`` (expected bucket
    occupancy ≤ target).  ONE text, evaluated identically by Spark SQL
    and DuckDB — integer comparisons only, so no float ``log2``
    edge cases at exact powers of two.

    Fixed-width keys make every bucketed candidate join quadratic in
    corpus size (occupancy ∝ N); width that grows with log(N) holds
    occupancy at ``target`` until ``target·2^max_bits`` rows, after
    which max_bits (and the plane count backing it) is the knob.  The
    r10 100× probe measured both fixed-width users failing at 200k
    vectors (ann_lsh_bucketed DNF on >78 GB of spill,
    dedup_embedding_cosine ~40 GB); see SCALE.md r10."""
    whens = " ".join(
        f"WHEN {n_expr} <= {target * (1 << b)} THEN {b}"
        for b in range(min_bits, max_bits)
    )
    return f"(CASE {whens} ELSE {max_bits} END)"


def _d(col: Column) -> Column:
    """Elementwise cast to double — the parity contract (float32 math
    differs between engines; double math on float32 inputs does not)."""
    return F.transform(col, lambda x: x.cast("double"))


def dot(a: Column, b: Column) -> Column:
    """Left-fold dot product: aggregate(zip_with(a,b,*), 0.0, +)."""
    return F.aggregate(
        F.zip_with(_d(a), _d(b), lambda x, y: x * y), F.lit(0.0), lambda acc, v: acc + v
    )


def l2_norm(a: Column) -> Column:
    return F.sqrt(dot(a, a))


def cosine(a: Column, b: Column) -> Column:
    return dot(a, b) / (l2_norm(a) * l2_norm(b))


# --- SQL-text twins of the vector folds (r13, guide §7.3) ------------
#
# Every HOF lambda built through the Column API costs a py4j round-trip
# cascade (~25-70 ms each, measured r13), and the embedding queries
# build a handful per construction.  These twins render the SAME
# expression tree as SQL text parsed in ONE call; ``0.0D`` is the same
# double-typed zero as ``F.lit(0.0)``, and the CASE form is what
# ``F.when(..).otherwise(..)`` compiles to.  Results are node-for-node
# identical to the Column forms (differential pins in
# tests/test_vector_sql_twins.py).


def d_sql(a_sql: str) -> str:
    """:func:`_d` as SQL text."""
    return f"transform({a_sql}, x -> CAST(x AS DOUBLE))"


def dot_sql(a_sql: str, b_sql: str) -> str:
    """:func:`dot` as SQL text (the ``_d`` double-cast included)."""
    return (
        "aggregate(zip_with({a}, {b}, (x, y) -> x * y), "
        "0.0D, (acc, v) -> acc + v)"
    ).format(a=d_sql(a_sql), b=d_sql(b_sql))


def l2_norm_sql(a_sql: str) -> str:
    """:func:`l2_norm` as SQL text."""
    return f"sqrt({dot_sql(a_sql, a_sql)})"


def cosine_sql(a_sql: str, b_sql: str) -> str:
    """:func:`cosine` as SQL text."""
    return "({d}) / (({na}) * ({nb}))".format(
        d=dot_sql(a_sql, b_sql), na=l2_norm_sql(a_sql), nb=l2_norm_sql(b_sql)
    )


def hyperplane_signs(n_planes: int, dim: int, seed: str = "ann") -> list[list[int]]:
    """Deterministic ±1 hyperplane matrix from md5 — reproducible in any
    engine/language, no RNG state.  Element (p, j) is +1 iff the first
    hex digit of md5("seed:p:j") is even."""
    mat = []
    for p in range(n_planes):
        row = []
        for j in range(dim):
            h = hashlib.md5(f"{seed}:{p}:{j}".encode()).hexdigest()
            row.append(1 if int(h[0], 16) % 2 == 0 else -1)
        mat.append(row)
    return mat


def lsh_bucket(vec: Column, planes: list[list[int]]) -> Column:
    """Sign-LSH bucket id: one char per hyperplane ('1' if dot ≥ 0),
    concatenated to an n_planes-bit string key.

    The plane matrix enters the plan as ONE parsed 2-level literal
    walked by a ``transform`` — the same two plan-cost rules
    :func:`lsh_table_keys` documents: per-element ``F.lit`` py4j
    round-trips cost ~0.5 ms each (8×64 planes ≈ 0.3 s of driver time
    per query construction, measured r13), and expanding each plane
    into its own aggregate sub-tree makes Catalyst analysis
    super-linear in plane count.  Emitted bits, and therefore keys,
    are byte-identical to the unrolled form."""
    planes_lit = _planes_2d_lit(tuple(tuple(row) for row in planes))
    return F.array_join(
        F.transform(
            planes_lit,
            lambda row: F.when(dot(vec, row) >= 0, F.lit("1")).otherwise(F.lit("0")),
        ),
        "",
    )


@lru_cache(maxsize=32)
def _planes_2d_sql(planes: tuple[tuple[int, ...], ...]) -> str:
    """SQL text of the 2-level plane-matrix literal, memoized per
    process (the plane matrices are module constants)."""
    return (
        "array("
        + ",".join(
            "array(" + ",".join(f"{float(w)!r}D" for w in row) + ")" for row in planes
        )
        + ")"
    )


@lru_cache(maxsize=32)
def _planes_2d_lit(planes: tuple[tuple[int, ...], ...]) -> Column:
    """Parsed 2-level plane-matrix literal, memoized per process: the
    plane matrices are module constants, parsing+building the literal
    Column costs real driver time per query construction, and an
    unresolved Column is immutable and session-independent — pure plan
    metadata reuse (r13)."""
    return F.expr(_planes_2d_sql(planes))


def lsh_bucket_sql(vec_sql: str, planes: list[list[int]]) -> str:
    """:func:`lsh_bucket` as SQL text — same emitted bits and keys,
    with the whole per-plane fold going through the parser in ONE call
    instead of a py4j lambda cascade (r13, guide §7.3)."""
    planes_sql = _planes_2d_sql(tuple(tuple(row) for row in planes))
    return (
        "array_join(transform({lit}, row -> "
        "CASE WHEN ({d}) >= 0 THEN '1' ELSE '0' END), '')"
    ).format(lit=planes_sql, d=dot_sql(vec_sql, "row"))


@lru_cache(maxsize=32)
def _planes_3d_sql(
    planes: tuple[tuple[int, ...], ...], planes_per_table: int
) -> str:
    """SQL text of the 3-level (table-grouped) plane literal, memoized
    per process — see :func:`_planes_2d_sql`."""
    n_tables = len(planes) // planes_per_table
    return (
        "array("
        + ",".join(
            "array("
            + ",".join(
                "array("
                + ",".join(f"{float(w)!r}D" for w in planes[t * planes_per_table + p])
                + ")"
                for p in range(planes_per_table)
            )
            + ")"
            for t in range(n_tables)
        )
        + ")"
    )


@lru_cache(maxsize=32)
def _planes_3d_lit(
    planes: tuple[tuple[int, ...], ...], planes_per_table: int
) -> Column:
    """Parsed 3-level (table-grouped) plane literal, memoized per
    process — see :func:`_planes_2d_lit`."""
    return F.expr(_planes_3d_sql(planes, planes_per_table))


@lru_cache(maxsize=128)
def expr_cached(sql: str) -> Column:
    """``F.expr`` memoized per process on the SQL text (r14) — the
    general form of :func:`_planes_2d_lit`/:func:`_planes_3d_lit`.

    Parsing a plane-matrix fold (4k double literals) costs ~0.1 s of
    driver time PER QUERY CONSTRUCTION, and every bench/driver run
    reconstructs its queries; the texts are deterministic functions of
    module constants, and an unresolved parsed Column is immutable,
    session-independent plan METADATA — reusing it never reuses data
    or results.  Only worth routing through here for payload-heavy
    texts (plane folds, codebooks); trivial expressions don't repay
    the cache lookup."""
    return F.expr(sql)


def lsh_table_keys_sql(
    vec_sql: str, planes: list[list[int]], planes_per_table: int = 4
) -> str:
    """:func:`lsh_table_keys` as SQL text — the nested per-table /
    per-plane fold parsed in ONE call; same (band, key) structs
    (r13, guide §7.3)."""
    tables_sql = _planes_3d_sql(
        tuple(tuple(row) for row in planes), planes_per_table
    )
    return (
        "transform({lit}, (tbl, t) -> named_struct("
        "'band', CAST(t AS INT), "
        "'key', array_join(transform(tbl, row -> "
        "CASE WHEN ({d}) >= 0 THEN '1' ELSE '0' END), '')))"
    ).format(lit=tables_sql, d=dot_sql(vec_sql, "row"))


def lsh_table_keys(vec: Column, planes: list[list[int]], planes_per_table: int = 4) -> Column:
    """Multi-table sign-LSH: group the hyperplanes into L tables of
    ``planes_per_table`` and emit an array of ``(band, key)`` structs —
    two vectors are candidates iff they share a key in ANY table.

    The standard recall lever: P[candidate] = 1 - (1 - p^k)^L where
    p = 1 - θ/π.  One 16-plane table has near-zero recall on
    weakly-correlated vectors; 4 tables × 4 planes passes θ≈45° pairs
    with p≈0.79 while still pruning ~15/16 of the corpus per table.

    The plane matrix enters the plan as ONE 3-level literal array
    walked by a nested ``transform`` — expanding each plane into its
    own aggregate sub-tree instead makes Catalyst analysis + codegen
    super-linear in plane count (measured ~9 s of one-time plan cost at
    64 planes vs ~0.1 s for this form; per-row math is identical).
    The literal itself is built as ONE parsed SQL string, not nested
    ``F.lit`` calls: 64×64 planes is 4096 elements, and a py4j
    round-trip per element costs ~2.4 s of driver time before the
    query even exists (measured; the parse path is ~0.1 s).
    """
    tables_lit = _planes_3d_lit(
        tuple(tuple(row) for row in planes), planes_per_table
    )
    return F.transform(
        tables_lit,
        lambda tbl, t: F.struct(
            t.cast("int").alias("band"),
            F.array_join(
                F.transform(
                    tbl,
                    lambda row: F.when(dot(vec, row) >= 0, F.lit("1")).otherwise(F.lit("0")),
                ),
                "",
            ).alias("key"),
        ),
    )


def brute_force_topk(
    vectors: DataFrame,
    queries: DataFrame,
    k: int,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact cosine top-k: broadcast the (small) query set against the
    sharded vector table, window top-k per query.

    Output: (query_id, neighbor_id, cos).  Self-matches excluded.
    The per-query window partitions on query_id — |Q| partitions, each
    holding N candidate rows at worst; for large |Q| switch to the LSH
    path, this is the oracle/baseline.
    """
    from pyspark.sql import Window

    # norms once per vector (array folds are interpreted — folding a·a
    # and b·b per PAIR would triple the hot-loop cost); cosine per pair
    # is then a single dot + one division
    q = queries.select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).alias("qvec"),
        l2_norm(F.col(vec_col)).alias("qnorm"),
    )
    v = vectors.select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).alias("nvec"),
        l2_norm(F.col(vec_col)).alias("nnorm"),
    )
    scored = (
        v.crossJoin(F.broadcast(q))
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .withColumn("cos", dot(F.col("qvec"), F.col("nvec")) / (F.col("qnorm") * F.col("nnorm")))
    )
    w = Window.partitionBy("query_id").orderBy(F.col("cos").desc(), F.col("neighbor_id"))
    return (
        scored.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= k)
        .select("query_id", "neighbor_id", F.round("cos", 6).alias("cos"), "rk")
    )

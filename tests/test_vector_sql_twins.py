"""Differential pins: the SQL-text twins of the vector folds
(pipeline/similarity.py, operators/kmeans.py — r13 driver-time
optimization) must be value-identical to the Column-API forms they
replace on every row, including NULL and empty-array edges.

The twins exist because each HOF lambda built through the Column API
costs a py4j round-trip cascade; they must stay *expression-level*
rewrites — same tree, parsed in one call — so any divergence here is a
bug in the twin, never a contract change.
"""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest

from fletcher_spark.operators import kmeans as KM
from fletcher_spark.pipeline import similarity as SIM

PLANES = SIM.hyperplane_signs(8, 4, seed="twin-test")


@pytest.fixture(scope="module")
def vecs(spark):
    rows = [
        (1, [1.0, 2.0, -3.5, 0.25], [0.5, -1.0, 2.0, 4.0]),
        (2, [0.0, 0.0, 0.0, 0.0], [1.0, 1.0, 1.0, 1.0]),
        (3, [-2.5, 1e-5, 3e7, -0.125], [2.0, -2.0, 0.5, -0.5]),
        (4, None, [1.0, 2.0, 3.0, 4.0]),
        (5, [1.5, -1.5, 2.25, -2.25], None),
    ]
    return spark.createDataFrame(rows, "vec_id long, a array<double>, b array<double>")


def _pairs(df, col_form, sql_form):
    got = df.select(
        col_form.alias("col_form"), F.expr(sql_form).alias("sql_form")
    ).collect()
    for r in got:
        assert r["col_form"] == r["sql_form"], r
    return got


def test_dot_twin(vecs):
    _pairs(vecs, SIM.dot(F.col("a"), F.col("b")), SIM.dot_sql("`a`", "`b`"))


def test_l2_norm_twin(vecs):
    _pairs(vecs, SIM.l2_norm(F.col("a")), SIM.l2_norm_sql("`a`"))


def test_cosine_twin(vecs):
    # the zero vector divides by zero under ANSI in BOTH forms — cosine
    # is only ever applied to non-degenerate vectors in the queries
    nz = vecs.filter(F.col("vec_id") != 2)
    _pairs(nz, SIM.cosine(F.col("a"), F.col("b")), SIM.cosine_sql("`a`", "`b`"))


def test_lsh_bucket_twin(vecs):
    _pairs(
        vecs,
        SIM.lsh_bucket(F.col("a"), PLANES),
        SIM.lsh_bucket_sql("`a`", PLANES),
    )


def test_lsh_table_keys_twin(vecs):
    _pairs(
        vecs,
        SIM.lsh_table_keys(F.col("a"), PLANES, 4),
        SIM.lsh_table_keys_sql("`a`", PLANES, 4),
    )


def test_nearest_struct_twin(vecs):
    cent = [(1, [0.0, 0.0, 0.0, 0.0]), (2, [1.0, 2.0, -3.5, 0.25]), (3, [1.0, 1.0, 1.0, 1.0])]
    col_form = F.array_min(
        F.transform(
            KM.centroid_literal(cent),
            lambda c: F.struct(
                KM.l2sq(F.col("a"), c["cv"]).alias("d2"), c["cid"].alias("cid")
            ),
        )
    )
    _pairs(vecs, col_form, KM.nearest_struct_sql("`a`", cent))


def test_lsh_band_keys_twin(spark):
    from fletcher_spark.pipeline import dedup as D

    rows = [(1, [11, 22, 33, 44, 55, 66, 77, 88, 99, 100, 101, 102]), (2, None)]
    df = spark.createDataFrame(rows, "doc_id long, sig array<long>")
    for bands, rws in [(4, 3), (3, 4), (2, 6)]:
        got = df.select(
            D.lsh_band_keys(F.col("sig"), bands, rws).alias("col_form"),
            F.expr(D.lsh_band_keys_sql("sig", bands, rws)).alias("sql_form"),
        ).collect()
        for r in got:
            assert r["col_form"] == r["sql_form"], (bands, rws, r)


def test_lsh_band_keys_adaptive_twin(spark):
    from fletcher_spark.pipeline import dedup as D

    rows = [(1, [11, 22, 33, 44, 55, 66, 77, 88, 99, 100, 101, 102], n)
            for n in (1, 20_000, 100_000, 5_000_000)]
    df = spark.createDataFrame(rows, "doc_id long, sig array<long>, n long")
    got = df.select(
        D.lsh_band_keys_adaptive(F.col("sig"), F.col("n")).alias("col_form"),
        F.expr(D.lsh_band_keys_adaptive_sql("sig", "n")).alias("sql_form"),
    ).collect()
    for r in got:
        assert r["col_form"] == r["sql_form"], r


def test_simhash_chunk_key_twins(spark):
    from fletcher_spark.pipeline import dedup as D

    rows = [(1, -0x123456789ABCDEF0, 0x7EDCBA9876543210), (2, 0, -1)]
    df = spark.createDataFrame(rows, "doc_id long, sig1 long, sig2 long")
    got = df.select(
        D.simhash_chunks_packed(F.col("sig1"), 8).alias("c64"),
        F.expr(D.simhash_chunks_packed_sql("sig1", 8)).alias("s64"),
        D.simhash_chunks_packed_128(F.col("sig1"), F.col("sig2"), 8).alias("c128"),
        F.expr(D.simhash_chunks_packed_128_sql("sig1", "sig2", 8)).alias("s128"),
    ).collect()
    for r in got:
        assert r["c64"] == r["s64"], r
        assert r["c128"] == r["s128"], r


def test_assign_nearest_ties_break_low_cid(spark):
    # two equidistant centroids: struct comparison orders d2 then cid
    v = spark.createDataFrame([(1, [0.0, 0.0])], "id long, v array<double>")
    cent = [(7, [1.0, 0.0]), (3, [-1.0, 0.0])]
    out = KM.assign_nearest(v, cent, "id", "v").collect()[0]
    assert out["cid"] == 3 and out["d2"] == 1.0


def test_repr_double_literals_roundtrip(spark):
    # the `D`-suffixed repr path must round-trip awkward doubles exactly
    vals = [1e-5, 3e7, -0.1, 2.0 / 3.0, 1.7976931348623157e308, 5e-324]
    cent = [(1, vals)]
    got = spark.sql(f"SELECT {KM.centroid_literal_sql(cent)} AS c").collect()[0]["c"]
    assert list(got[0]["cv"]) == vals

"""Z-order clustering: bounding-box pruning evidence.

``write_zordered`` claims that clustering files by the Morton key of
two columns lets min/max stats prune scans with predicates on either
dimension.  We verify that claim with arithmetic, not plans: write the
same data (a) z-ordered and (b) range-partitioned on one column, read
back each FILE's min/max box over both columns, and count how many
files a workload of small rectangle predicates would have to open.
Z-order must beat the single-column sort on the two-dimensional
workload and massively beat it on the neglected dimension.
"""

from __future__ import annotations

import glob
import os

import pyarrow.parquet as pq
import pyspark.sql.functions as F
import pytest

from fletcher_spark.io import load_tables, write_zordered, zorder_value
from tests.conftest import SF_DIR

N_FILES = 8


@pytest.fixture(scope="module")
def layouts(spark, tmp_path_factory):
    base = str(tmp_path_factory.mktemp("zorder"))
    df = load_tables(spark, SF_DIR)["orders"].select(
        "o_orderkey", "o_custkey", "o_totalprice"
    )
    zpath, spath = os.path.join(base, "z"), os.path.join(base, "s")
    write_zordered(df, zpath, "o_custkey", "o_totalprice", N_FILES)
    (
        df.repartitionByRange(N_FILES, "o_custkey")
        .sortWithinPartitions("o_custkey")
        .write.mode("overwrite")
        .parquet(spath)
    )
    return df, zpath, spath


def _file_boxes(path):
    boxes = []
    for f in glob.glob(os.path.join(path, "*.parquet")):
        t = pq.read_table(f, columns=["o_custkey", "o_totalprice"])
        if t.num_rows == 0:
            continue
        ck, tp = t.column("o_custkey").to_pylist(), t.column("o_totalprice").to_pylist()
        boxes.append((min(ck), max(ck), min(tp), max(tp)))
    return boxes


def _files_hit(boxes, ck_lo, ck_hi, tp_lo, tp_hi):
    return sum(
        1
        for (a, b, c, d) in boxes
        if not (b < ck_lo or a > ck_hi or d < tp_lo or c > tp_hi)
    )


def test_zorder_prunes_both_dimensions(layouts):
    df, zpath, spath = layouts
    lo_p, hi_p = df.agg(F.min("o_totalprice"), F.max("o_totalprice")).collect()[0]
    lo_c, hi_c = df.agg(F.min("o_custkey"), F.max("o_custkey")).collect()[0]
    zb, sb = _file_boxes(zpath), _file_boxes(spath)
    assert len(zb) == N_FILES

    # Workload: small rectangles — 1/4 of each dimension, swept across
    # the space deterministically.
    span_c, span_p = (hi_c - lo_c) / 4, (hi_p - lo_p) / 4
    hits_z = hits_s = 0
    price_only_z = price_only_s = 0
    for i in range(4):
        for j in range(4):
            ck0, tp0 = lo_c + i * span_c, lo_p + j * span_p
            hits_z += _files_hit(zb, ck0, ck0 + span_c, tp0, tp0 + span_p)
            hits_s += _files_hit(sb, ck0, ck0 + span_c, tp0, tp0 + span_p)
        tp0 = lo_p + i * span_p
        price_only_z += _files_hit(zb, lo_c, hi_c, tp0, tp0 + span_p)
        price_only_s += _files_hit(sb, lo_c, hi_c, tp0, tp0 + span_p)

    # On the dimension the single-column sort ignores, it prunes nothing.
    assert price_only_s == 4 * len(sb)
    assert price_only_z < price_only_s, (
        f"z-order must prune on the second dimension: {price_only_z} vs {price_only_s}"
    )
    # And on the 2-D workload, z-order must open fewer files overall.
    assert hits_z < hits_s, f"2-D workload: z-order {hits_z} vs single-sort {hits_s}"


def test_zorder_value_is_morton_interleave(spark):
    """Planted grid: with col values already on [0, 3] and bits=2, the
    z-value must equal the hand-computed Morton interleave."""
    rows = [(a, b) for a in range(4) for b in range(4)]
    df = spark.createDataFrame(rows, "a int, b int")
    out = {
        (r["a"], r["b"]): r["z"]
        for r in df.withColumn("z", zorder_value(df, "a", "b", bits=2)).collect()
    }

    def morton(x, y):
        z = 0
        for i in range(2):
            z |= ((x >> i) & 1) << (2 * i) | ((y >> i) & 1) << (2 * i + 1)
        return z

    for (a, b), z in out.items():
        assert z == morton(a, b), f"({a},{b}) -> {z} != {morton(a, b)}"


def test_zorder_roundtrip_preserves_rows(spark, layouts):
    df, zpath, _ = layouts
    back = spark.read.parquet(zpath)
    assert back.count() == df.count()
    assert set(back.columns) == set(df.columns)
    a = df.agg(F.sum("o_totalprice")).collect()[0][0]
    b = back.agg(F.sum("o_totalprice")).collect()[0][0]
    assert a == pytest.approx(b)


def test_zorder_empty_and_null_inputs(spark, tmp_path):
    """An empty delta snapshot must write (not crash), and NULL cluster
    values must land in grid cell 0, not the top corner."""
    import os

    from pyspark.sql import functions as F

    empty = spark.createDataFrame([], "a int, b int, x string")
    p = os.path.join(str(tmp_path), "empty")
    write_zordered(empty, p, "a", "b", n_files=2)
    assert spark.read.parquet(p).count() == 0

    withnull = spark.createDataFrame(
        [(None, 3, "n"), (0, 0, "lo"), (3, 3, "hi")], "a int, b int, x string"
    )
    z = withnull.withColumn("z", zorder_value(withnull, "a", "b", bits=2)).collect()
    byx = {r["x"]: r["z"] for r in z}
    assert byx["n"] < byx["hi"], "NULL row must not cluster into the max corner"

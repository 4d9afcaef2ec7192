"""Shared fixtures: one SparkSession per test run + a DuckDB oracle.

The oracle comparator mirrors the driver's: sort columns by name, sort
rows, compare values exactly (floats are pre-rounded inside the queries
themselves, so exact comparison is legitimate).
"""

from __future__ import annotations

import math
import os

import duckdb
import pytest

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")
TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings"
).split()


@pytest.fixture(scope="session")
def spark():
    from fletcher_spark.session import get_spark

    cpus = os.environ.get("SPARK_GRAFT_TEST_CPUS", "4")
    spark = get_spark("fletcher-spark-tests", master=f"local[{cpus}]", shuffle_partitions=8)
    yield spark
    spark.stop()


@pytest.fixture(scope="session")
def duck():
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'")
    yield con
    con.close()


def normalize(rows, colnames):
    """Canonical form: columns sorted by name, rows sorted, floats keyed
    by repr (queries round on both sides, so repr equality is exact)."""
    order = sorted(range(len(colnames)), key=lambda i: colnames[i])

    def canon(v):
        if isinstance(v, float):
            if math.isnan(v):
                return "NaN"
            # collapse -0.0 / 0.0 and float32→float64 noise
            return repr(round(v, 6))
        if isinstance(v, (list, tuple)):
            return tuple(canon(x) for x in v)
        return v

    out = [tuple(canon(r[i]) for i in order) for r in rows]
    return sorted(out, key=repr), [colnames[i] for i in order]


def assert_matches_oracle(spark, duck, name, sf_dir=SF_DIR):
    """Run a registered query on Spark and its oracle on DuckDB; compare."""
    from fletcher_spark.queries import registry

    registry.load_all()
    sdf = registry.QUERIES[name](spark, sf_dir)
    srows = [tuple(r) for r in sdf.collect()]
    scols = sdf.columns

    sql = registry.ORACLE.get(name)
    if sql is None:
        # rows-only check: mirror the driver's rows>0 smoke contract so a
        # broken plan returning an empty frame cannot pass silently.
        assert len(srows) > 0, f"{name}: rows-only query returned no rows"
        return srows
    rel = duck.sql(sql)
    drows = rel.fetchall()
    dcols = list(rel.columns)

    s_norm, s_cols = normalize(srows, scols)
    d_norm, d_cols = normalize(drows, dcols)
    assert s_cols == d_cols, f"{name}: column names differ: {s_cols} vs {d_cols}"
    assert len(s_norm) == len(d_norm), (
        f"{name}: row count differs: spark={len(s_norm)} duckdb={len(d_norm)}"
    )
    for i, (a, b) in enumerate(zip(s_norm, d_norm)):
        assert a == b, f"{name}: row {i} differs:\n  spark : {a}\n  duckdb: {b}"
    return srows

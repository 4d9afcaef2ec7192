"""Partitioned parquet layout: hive-style partitionBy write, partition
pruning on read-back, and schema-evolution merge — the §2.1 sink
capabilities that decide 100 TB scan cost (a pruned partition is never
opened; a pruned column is never decoded)."""

from __future__ import annotations

import pyarrow as pa

from pyspark.sql import functions as F

from fletcher_spark.io import load_tables, write_parquet
from tests.conftest import SF_DIR


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_partitioned_write_prunes_on_read(spark, tmp_path):
    docs = load_tables(spark, SF_DIR)["documents"]
    out = str(tmp_path / "docs_by_lang")
    write_parquet(docs, out, partition_by=["lang"])

    back = spark.read.parquet(out)
    one = back.filter(F.col("lang") == "de")

    # partition pruning: the lang predicate becomes a PartitionFilters
    # entry on the scan (directory-level skip), not a row-level filter
    plan = _plan(one)
    assert "PartitionFilters" in plan and "lang" in plan.split("PartitionFilters", 1)[1][:200]

    expected = docs.filter(F.col("lang") == "de").count()
    assert one.count() == expected and expected > 0


def test_partitioned_roundtrip_values(spark, tmp_path):
    docs = load_tables(spark, SF_DIR)["documents"].select("doc_id", "text", "lang")
    out = str(tmp_path / "docs_rt")
    write_parquet(docs, out, partition_by=["lang"])
    back = spark.read.parquet(out).select("doc_id", "text", "lang")
    a = sorted(tuple(r) for r in docs.collect())
    b = sorted(tuple(r) for r in back.collect())
    assert a == b


def test_schema_evolution_merge(spark, tmp_path):
    """Two writer generations (second adds a column); mergeSchema reads
    the union schema with nulls for the missing column — the append-only
    evolution every long-lived 100 TB dataset needs."""
    out = str(tmp_path / "evolving")
    v1 = spark.createDataFrame([(1, "a")], "id long, s string")
    v1.write.mode("overwrite").parquet(out + "/gen=1")
    v2 = spark.createDataFrame([(2, "b", 3.5)], "id long, s string, score double")
    v2.write.mode("overwrite").parquet(out + "/gen=2")

    merged = spark.read.option("mergeSchema", "true").parquet(out)
    rows = {r["id"]: r for r in merged.collect()}
    assert set(merged.columns) >= {"id", "s", "score"}
    assert rows[1]["score"] is None and abs(rows[2]["score"] - 3.5) < 1e-9

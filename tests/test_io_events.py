"""normalize_events layout adaptation: the harness has shipped events.ts
as timestamp[ns]-surfaced-as-long (round 1) and timestamp[us] (round 2+);
both layouts must yield identical columns, IN THE SAME ORDER, with
equivalent values (the ADVICE r2 positional-pairing hazard)."""

from __future__ import annotations

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from fletcher_spark.io import normalize_events

US = 1_700_000_000_000_000  # some epoch microseconds


@pytest.fixture(scope="module")
def layouts(spark, tmp_path_factory):
    base = tmp_path_factory.mktemp("events_layouts")
    legacy = str(base / "legacy")
    micro = str(base / "micro")
    ids = pa.array([1, 2], pa.int64())
    pq.write_table(
        pa.table({"event_id": ids, "ts": pa.array([US * 1000, (US + 5) * 1000], pa.int64())}),
        legacy + ".parquet",
    )
    pq.write_table(
        pa.table({"event_id": ids, "ts": pa.array([US, US + 5], pa.timestamp("us"))}),
        micro + ".parquet",
    )
    return legacy + ".parquet", micro + ".parquet"


def test_normalize_events_layout_independent(spark, layouts):
    legacy_path, micro_path = layouts
    a = normalize_events(spark.read.parquet(legacy_path))
    b = normalize_events(spark.read.parquet(micro_path))
    # identical column ORDER (positional ops across layouts must pair
    # ts_us with ts_us, never ts_ns)
    assert a.columns == b.columns
    assert a.columns[-2:] == ["ts_us", "ts_ns"]
    ra = {r["event_id"]: r for r in a.collect()}
    rb = {r["event_id"]: r for r in b.collect()}
    for k in (1, 2):
        assert ra[k]["ts_us"] == rb[k]["ts_us"]
        assert ra[k]["ts_ns"] == rb[k]["ts_ns"] == ra[k]["ts_us"] * 1000
        assert ra[k]["ts"] == rb[k]["ts"]


def test_compact_parquet_small_files(spark, tmp_path):
    """Compaction: 64 tiny files → few target-sized files, content
    identical (row multiset equality)."""
    from fletcher_spark.io import compact_parquet, load_tables
    from tests.conftest import SF_DIR

    src = str(tmp_path / "fragmented")
    out = str(tmp_path / "compacted")
    li = load_tables(spark, SF_DIR)["lineitem"].select(
        "l_orderkey", "l_partkey", "l_quantity"
    )
    li.repartition(64).write.parquet(src)
    assert len(spark.read.parquet(src).inputFiles()) == 64

    n = compact_parquet(spark, src, out, target_mb=128)
    got = spark.read.parquet(out)
    assert len(got.inputFiles()) == n
    assert n < 64
    a = sorted(map(tuple, li.collect()))
    b = sorted(map(tuple, got.collect()))
    assert a == b


def test_write_training_shards_deterministic(spark, tmp_path):
    """Range-sharded output: per-file key ranges are disjoint and
    internally sorted, and the full row multiset is preserved."""
    from fletcher_spark.io import load_tables, write_training_shards
    from tests.conftest import SF_DIR

    docs = load_tables(spark, SF_DIR)["documents"].select("doc_id", "n_chars")
    out = str(tmp_path / "shards")
    write_training_shards(docs, out, 4, "doc_id")

    import pyarrow.parquet as pq

    files = [f for f in __import__("os").listdir(out) if f.endswith(".parquet")]
    assert len(files) == 4
    ranges = []
    for f in files:
        col = pq.read_table(f"{out}/{f}", columns=["doc_id"])["doc_id"].to_pylist()
        assert col == sorted(col), f"{f} not sorted within shard"
        if col:
            ranges.append((min(col), max(col)))
    ranges.sort()
    for (lo1, hi1), (lo2, hi2) in zip(ranges, ranges[1:]):
        assert hi1 < lo2, "shard key ranges overlap"
    got = sorted(r["doc_id"] for r in spark.read.parquet(out).collect())
    want = sorted(r["doc_id"] for r in docs.collect())
    assert got == want


def test_dataset_checksum_order_invariant_and_mutation_sensitive(spark, tmp_path):
    """The checksum's two claims: identical content in ANY partitioning
    / row order produces identical (n_rows, xor, sum) per group; a
    single mutated row changes the checksum while preserving counts."""
    import os

    import pyspark.sql.functions as F

    from fletcher_spark.io import load_tables
    from fletcher_spark.queries import registry
    from tests.conftest import SF_DIR

    registry.load_all()

    def _sfdir_with_lineitem(df, name):
        d = str(tmp_path / name)
        os.makedirs(d, exist_ok=True)
        df.write.mode("overwrite").parquet(os.path.join(d, "lineitem.parquet"))
        for t in (
            "region nation customer supplier part orders events documents embeddings"
        ).split():
            os.symlink(
                os.path.join(SF_DIR, f"{t}.parquet"), os.path.join(d, f"{t}.parquet")
            )
        return d

    def _check(sf_dir):
        return {
            r["l_returnflag"]: (r["n_rows"], r["xor_check"], r["sum_check"])
            for r in registry.QUERIES["dataset_checksum"](spark, sf_dir).collect()
        }

    base = _check(SF_DIR)
    li = load_tables(spark, SF_DIR)["lineitem"]

    # same rows, totally different physical layout and order
    shuffled = _sfdir_with_lineitem(
        li.repartition(7, "l_partkey").sortWithinPartitions("l_suppkey"), "shuf"
    )
    assert _check(shuffled) == base, "checksum must be layout-invariant"

    # mutate exactly one existing row's quantity
    k = li.select(F.min("l_orderkey")).collect()[0][0]
    mutated = li.withColumn(
        "l_quantity",
        F.when(F.col("l_orderkey") == k, F.col("l_quantity") + 1).otherwise(
            F.col("l_quantity")
        ),
    )
    mut = _check(_sfdir_with_lineitem(mutated, "mut"))
    assert mut != base, "a mutated row must change the checksum"
    assert sum(v[0] for v in mut.values()) == sum(v[0] for v in base.values())

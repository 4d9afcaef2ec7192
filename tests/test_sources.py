"""Custom Python DataSource (fletcher_corpus): schema, determinism
across partition counts, partition-parallel planning, and composition
with downstream operators."""

from __future__ import annotations

from pyspark.sql import functions as F

from fletcher_spark.sources import python_ds


def _read(spark, **opts):
    python_ds.register(spark)
    r = spark.read.format("fletcher_corpus")
    for k, v in opts.items():
        r = r.option(k, v)
    return r.load()


def test_corpus_schema_and_count(spark):
    df = _read(spark, n_docs=500, n_parts=4)
    assert df.schema.simpleString() == (
        "struct<doc_id:bigint,text:string,lang:string,n_tokens:int>"
    )
    assert df.count() == 500


def test_corpus_deterministic_across_partitioning(spark):
    a = sorted(tuple(r) for r in _read(spark, n_docs=300, n_parts=2).collect())
    b = sorted(tuple(r) for r in _read(spark, n_docs=300, n_parts=7).collect())
    assert a == b
    assert len(a) == 300


def test_corpus_partition_parallel(spark):
    df = _read(spark, n_docs=1000, n_parts=5)
    assert df.rdd.getNumPartitions() == 5


def test_corpus_values_match_generator(spark):
    rows = {r["doc_id"]: r for r in _read(spark, n_docs=50, n_parts=3).collect()}
    for doc_id in (0, 17, 49):
        expected = python_ds._make_doc("corpus", doc_id)
        assert tuple(rows[doc_id]) == expected
    assert all(r["n_tokens"] == len(r["text"].split()) for r in rows.values())


def test_corpus_composes_with_operators(spark):
    """The generated table is a first-class DataFrame: groupBy and the
    repo's own string operators run on it unchanged."""
    df = _read(spark, n_docs=400, n_parts=4)
    agg = df.groupBy("lang").agg(F.count(F.lit(1)).alias("n")).collect()
    assert sum(r["n"] for r in agg) == 400
    assert {r["lang"] for r in agg} <= {"en", "de", "fr", "es", "zh"}


def test_corpus_stream_matches_batch(spark, tmp_path):
    """Custom streaming source: micro-batches (offset-pure generation,
    checkpointable dict offsets) must reproduce the batch read exactly
    once drained."""
    python_ds.register(spark)
    stream = (
        spark.readStream.format("fletcher_corpus")
        .option("n_docs", 240)
        .option("batch_size", 70)
        .load()
    )
    q = (
        stream.writeStream.format("memory")
        .queryName("corpus_stream")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(processingTime="500 milliseconds")
        .start()
    )
    # drain: offsets stop advancing once n_docs is exhausted (the
    # availableNow trigger snapshots only the first prefetched batch
    # for driver-side simple readers, so poll instead)
    import time

    deadline = time.time() + 120
    while time.time() < deadline:
        if spark.sql("SELECT count(*) n FROM corpus_stream").collect()[0]["n"] >= 240:
            break
        time.sleep(1)
    q.stop()
    got = sorted(tuple(r) for r in spark.sql("SELECT * FROM corpus_stream").collect())
    expected = sorted(tuple(r) for r in _read(spark, n_docs=240, n_parts=3).collect())
    assert got == expected and len(got) == 240

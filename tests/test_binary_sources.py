"""Raw-asset ingestion surfaces: the built-in ``binaryFile`` source (the
door actual image/audio/video files enter the multimodal pipeline
through — path + modificationTime + content per file) and an ORC
sink/source round-trip (the other columnar format Spark ships without
extra packages)."""

from __future__ import annotations

from pyspark.sql import functions as F

from fletcher_spark.io import load_tables
from fletcher_spark.pipeline.multimodal import binary_features
from tests.conftest import SF_DIR


def test_binaryfile_source_feeds_multimodal_features(spark, tmp_path):
    assets = {f"img_{i}.bin": bytes([i]) * (100 + i) for i in range(5)}
    for name, payload in assets.items():
        (tmp_path / name).write_bytes(payload)

    df = (
        spark.read.format("binaryFile")
        .option("pathGlobFilter", "*.bin")
        .load(str(tmp_path))
        .select(
            F.element_at(F.split("path", "/"), -1).alias("fname"),
            F.col("length"),
            F.col("content"),
        )
    )
    feats = binary_features("content")
    out = {
        r["fname"]: r
        for r in df.select("fname", "length", *[v.alias(k) for k, v in feats.items()]).collect()
    }
    assert set(out) == set(assets)
    for name, payload in assets.items():
        r = out[name]
        assert r["length"] == len(payload)
        assert r["n_bytes"] == len(payload)
        assert r["n_chunks"] == -(-len(payload) // 64)
        import hashlib

        assert r["digest"] == hashlib.md5(payload).hexdigest()


def test_orc_roundtrip_preserves_values_and_prunes(spark, tmp_path):
    d = load_tables(spark, SF_DIR)["documents"]
    path = str(tmp_path / "docs_orc")
    d.write.mode("overwrite").orc(path)

    back = spark.read.orc(path)
    assert back.schema == d.schema
    assert back.count() == d.count()
    a = sorted(map(tuple, d.select("doc_id", "n_chars").collect()))
    b = sorted(map(tuple, back.select("doc_id", "n_chars").collect()))
    assert a == b

    # pushdown/pruning reach the ORC reader too
    q = back.filter(F.col("n_chars") > 300).select("doc_id")
    p = q._jdf.queryExecution().executedPlan().toString()
    assert "PushedFilters" in p and "n_chars" in p, p
    assert "ReadSchema: struct<doc_id:bigint,n_chars:bigint>" in p, p

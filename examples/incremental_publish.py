"""Incremental table publish demo — the maintenance loop a corpus table
lives under once it exists, wired from the library's operators:

    apply change log (CDC merge) → cluster layout (Z-order) →
    compact small files → audit the publish (snapshot diff counts)

Run:  python examples/incremental_publish.py [sf_dir] [out_dir]
(defaults: /root/testdata/sf0.001, /tmp/published)

The point vs a full rewrite: only the delta is windowed, the base is
touched by exactly one key-join pass, and the published layout carries
its own scan-pruning (per-file min/max boxes over both cluster
columns).  Every step prints the evidence.  See SCALE.md for the
per-stage 100 TB notes.
"""

from __future__ import annotations

import glob
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

from pyspark.sql import Window
from pyspark.sql import functions as F

from fletcher_spark import compact_parquet, get_spark, write_zordered
from fletcher_spark.io import load_tables


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    out = sys.argv[2] if len(sys.argv) > 2 else "/tmp/published"
    spark = get_spark("incremental-publish")
    t = load_tables(spark, sf_dir)

    # 1. CDC merge: collapse the event log to one change per key, apply
    #    upserts + tombstones to the customer base in ONE outer join.
    last = (
        t["events"]
        .select(
            "user_id",
            "event_type",
            "value",
            F.row_number()
            .over(
                Window.partitionBy("user_id").orderBy(
                    F.col("ts_us").desc(), F.col("event_id").desc()
                )
            )
            .alias("rk"),
        )
        .filter("rk = 1")
        .drop("rk")
    )
    base = t["customer"].select("c_custkey", "c_acctbal", "c_nationkey")
    merged = (
        base.join(last, base.c_custkey == last.user_id, "full_outer")
        .filter(F.coalesce(F.col("event_type"), F.lit("")) != "error")
        .select(
            F.coalesce("c_custkey", "user_id").alias("custkey"),
            F.coalesce("value", "c_acctbal").alias("acctbal"),
            F.coalesce("c_nationkey", F.lit(-1)).alias("nationkey"),
        )
    )
    n_base, n_merged = base.count(), merged.count()
    n_tombstoned = (
        last.filter(F.col("event_type") == "error")
        .join(base, last.user_id == base.c_custkey, "left_semi")
        .count()
    )
    n_new_keys = last.join(
        base, last.user_id == base.c_custkey, "left_anti"
    ).filter(F.col("event_type") != "error").count()
    print(f"merge: base {n_base} rows -> published {n_merged} "
          f"({n_tombstoned} tombstoned, {n_new_keys} new keys)")

    # 2. Z-order the published snapshot by (nationkey, acctbal) so scans
    #    filtering on either column prune files via min/max stats.
    zpath = os.path.join(out, "zordered")
    write_zordered(merged, zpath, "nationkey", "acctbal", n_files=4)
    print(f"zorder: wrote {len(glob.glob(os.path.join(zpath, '*.parquet')))} "
          f"clustered files to {zpath}")

    # 3. Compact: rewrite to ~128 MB target files (here: 1 tiny file —
    #    the step matters when micro-batches leave thousands).
    cpath = os.path.join(out, "compacted")
    n_files = compact_parquet(spark, zpath, cpath)
    print(f"compact: {n_files} output file(s) at {cpath}")

    # 4. Audit: the publish must account for every key.
    pub = spark.read.parquet(cpath)
    diff = (
        base.select(F.col("c_custkey").alias("k"))
        .join(pub.select(F.col("custkey").alias("k"), F.lit(1).alias("in_pub")), "k", "left")
        .agg(
            F.count(F.lit(1)).alias("base_keys"),
            F.sum(F.coalesce("in_pub", F.lit(0))).alias("kept"),
        )
        .collect()[0]
    )
    print(f"audit: {diff['kept']}/{diff['base_keys']} base keys present "
          f"(missing = tombstoned), published total {pub.count()}")
    assert diff["base_keys"] - diff["kept"] == n_tombstoned
    spark.stop()


if __name__ == "__main__":
    main()

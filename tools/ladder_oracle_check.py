"""One-off oracle check of the adaptive key-width ladder's WIDENED
branches (VERDICT r10 ask #3).

At every driver scale (sf0.001/0.01/0.1) ``bits_case_sql``
(pipeline/similarity.py) resolves to the BASE key width, reproducing
the pre-ladder keys bit-for-bit — so no driver correctness stamp has
ever exercised a widened branch.  This script replays the driver's
exact comparison (pandas_canon: sorted columns, type-tagged cells,
sorted rows) for the five ladder queries at ``.tmp/sf1`` (sf0.1 × 10:
20 000 embeddings, 50 000 documents — DuckDB-feasible), where the
ladder picks:

* ann_lsh_bucketed       : 8-bit table keys (base 4)   [n ≤ 128·2^b]
* dedup_embedding_cosine : 11-bit table keys (base 8)  [n ≤ 16·2^b]
* ann_ivf_probe          : 3-bit list sub-shards (base 0) [n ≤ 2500·2^b]
* ann_ivf_int8_rescore   : 3-bit list sub-shards (base 0)
* knn_graph_blocked      : 3-bit block sub-keys (base 0)
* dedup_minhash_lsh      : 3×4 Broder re-band (base 4×3) [LSH_BAND_LADDER,
  r12 — bands×rows ladder, the selectivity twin of the key-width genus]
* dedup_cc_clusters / pipeline_curate_corpus: same re-banded edge set

Results are recorded in SCALE.md (r11); a hash-match here means the
r10 quadratic-at-scale fixes carry a value-checked parity proof on the
branch that actually runs at scale, not just a wall-time.

Usage:  python tools/ladder_oracle_check.py [sf_dir=.tmp/sf1] [names...]

Set ``LSH_TEST_LADDER="1000:4:3,10000:3:4"`` to shrink the Broder band
ladder in BOTH engines before the oracles render — the r13 path for
value-checking the 2×6 floor rung (real threshold 2M docs) on the
50k-doc .tmp/sf1 corpus.
"""

from __future__ import annotations

import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

LADDER_QUERIES = [
    "ann_lsh_bucketed",
    "dedup_embedding_cosine",
    "ann_ivf_probe",
    "ann_ivf_int8_rescore",
    "knn_graph_blocked",
    "dedup_minhash_lsh",
]


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else os.path.join(REPO, ".tmp", "sf1")
    names = sys.argv[2:] or LADDER_QUERIES

    import duckdb
    from pyspark.sql import SparkSession

    # LSH_TEST_LADDER="1000:4:3,10000:3:4" shrinks the Broder band
    # ladder BEFORE the query modules render their oracle CTEs, so a
    # corpus that never reaches the real 2M-doc floor threshold trips
    # the 2×6 floor rung in BOTH engines (r13: the floor's two-scale
    # parity runs; the import-time rung assertions in pipeline/dedup.py
    # still validate the test ladder).  Patch must precede
    # registry.load_all(): queries/dedup.py and queries/textpipe.py
    # render lsh_rpb_case_sql into their oracle strings at import.
    test_ladder = os.environ.get("LSH_TEST_LADDER")
    if test_ladder:
        import fletcher_spark.pipeline.dedup as P

        P.LSH_BAND_LADDER = tuple(
            tuple(int(x) for x in entry.split(":")) for entry in test_ladder.split(",")
        )
        print(f"LSH_TEST_LADDER active: {P.LSH_BAND_LADDER} (floor {P.LSH_BAND_FLOOR})")

    from fletcher_spark.queries import registry
    from fletcher_spark.session import apply_runtime_confs
    from tests.conftest import TABLES, pandas_canon

    registry.load_all()
    # driver memory is fixed at JVM launch: the 1g local-mode default
    # carries sf1 (20k vectors) but OOMs on the sf10 tier's persisted
    # quantized frames — same sizing contract as tools/scale_probe.py
    spark = (
        SparkSession.builder.appName("ladder-oracle")
        .master("local[32]")
        .config("spark.ui.showConsoleProgress", "false")
        .config("spark.sql.shuffle.partitions", "32")
        .config(
            "spark.driver.memory",
            os.environ.get("LADDER_CHECK_DRIVER_MEM", "8g"),
        )
        .getOrCreate()
    )
    apply_runtime_confs(spark)
    spark.sparkContext.setLogLevel("ERROR")
    duck = duckdb.connect()
    # Optional resource caps for big-corpus sweeps: the r13 graph-
    # oracle incident showed a mis-planned DuckDB join can spill 78 GB
    # before failing.  DUCKDB_TEMP_CAP bounds total spill (DuckDB
    # aborts the query instead of filling the disk); DUCKDB_MEM bounds
    # the in-memory working set.
    if os.environ.get("DUCKDB_MEM"):
        duck.sql(f"SET memory_limit='{os.environ['DUCKDB_MEM']}'")
    if os.environ.get("DUCKDB_TEMP_CAP"):
        duck.sql("SET temp_directory='.tmp'")
        duck.sql(
            f"SET max_temp_directory_size='{os.environ['DUCKDB_TEMP_CAP']}'"
        )
    for t in TABLES:
        # slice scratch dirs (e.g. .tmp/sf1_slice) carry only the
        # tables the queries under check read — skip the rest
        if not os.path.exists(os.path.join(sf_dir, f"{t}.parquet")):
            print(f"  (no {t}.parquet in {sf_dir}; view skipped)", flush=True)
            continue
        duck.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")

    # informational only — and a slice dir may not carry embeddings at
    # all (e.g. a documents-only slice for the MinHash rung)
    if os.path.exists(os.path.join(sf_dir, "embeddings.parquet")):
        n_emb = duck.sql("SELECT count(*) FROM embeddings").fetchone()[0]
        print(f"sf_dir={sf_dir} embeddings={n_emb}", flush=True)
    else:
        print(f"sf_dir={sf_dir} (no embeddings table)", flush=True)

    bad = 0
    for name in names:
        t0 = time.time()
        try:
            pdf_s = registry.QUERIES[name](spark, sf_dir).toPandas()
            t_spark = time.time() - t0
            t0 = time.time()
            pdf_o = duck.sql(registry.ORACLE[name]).df()
            t_duck = time.time() - t0
            rows_s, cols_s = pandas_canon(pdf_s, name)
            rows_o, cols_o = pandas_canon(pdf_o, name)
            ok = len(rows_s) == len(rows_o) and cols_s == cols_o and rows_s == rows_o
            status = "HASH-MATCH" if ok else "FAIL"
            if not ok:
                bad += 1
                diff = [i for i, (a, b) in enumerate(zip(rows_s, rows_o)) if a != b][:2]
                print(
                    f"{status} {name}: rows={len(rows_s)}/{len(rows_o)} "
                    f"cols_match={cols_s == cols_o} first_diff={diff}",
                    flush=True,
                )
                for i in diff[:1]:
                    print(f"  spark : {rows_s[i]}\n  oracle: {rows_o[i]}")
                if not diff and len(rows_s) != len(rows_o):
                    # ADVICE r11: zip() truncates to the shorter side —
                    # if the shared prefix matches, show the first
                    # surplus row from the longer side instead of
                    # printing nothing.
                    i = min(len(rows_s), len(rows_o))
                    longer, side = (
                        (rows_s, "spark ") if len(rows_s) > len(rows_o) else (rows_o, "oracle")
                    )
                    print(f"  extra {side} row @{i}: {longer[i]}")
            else:
                print(
                    f"{status} {name}: rows={len(rows_s)} "
                    f"(spark {t_spark:.1f}s, duckdb {t_duck:.1f}s)",
                    flush=True,
                )
        except Exception as exc:  # noqa: BLE001 — report and continue
            bad += 1
            print(f"ERR {name}: {type(exc).__name__}: {exc}", flush=True)
    print(f"\n{len(names) - bad}/{len(names)} wide-branch hash-matches")
    spark.stop()
    return 1 if bad else 0


if __name__ == "__main__":
    raise SystemExit(main())

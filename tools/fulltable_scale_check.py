"""Rows-parity + sliced value parity for the full-table transforms at
a scratch scale (r13: the 100x ledger's tier for 8-60M-row outputs).

Full pandas_canon of a 60M-row result is a driver-side pure-Python
exercise (hours), not an engine test — these queries' complete value
parity stands at .tmp/sf1 (10x).  At 100x each one is checked two
ways instead:

* rows-parity: Spark ``count()`` vs DuckDB ``count(*)`` over the
  oracle — full-cardinality agreement;
* sliced value parity: the SAME key predicate (plain SQL over the
  OUTPUT columns) filters both engines' results to ~0.1-1%, and the
  slice goes through the full driver canon (pandas_canon).

The slice predicates apply to the query OUTPUT, after aggregation —
which is itself load-bearing: a predicate on session_agg's start
column used to be pushed below the session aggregate by Catalyst
(filtering EVENTS, yielding phantom split sessions); this script is
what caught it.  See streaming/windows.py:session_agg.

Usage:  python tools/fulltable_scale_check.py [sf_dir=.tmp/sf10] [names...]
"""

from __future__ import annotations

import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

#: output-column slice predicate per full-table query (same text is
#: valid Spark-SQL and DuckDB-SQL; integer key modulus or substring)
SLICES = {
    "window_running_sum": "o_orderkey % 997 = 0",
    "window_lag_lead": "event_id % 997 = 0",
    "union_all_concat": "o_orderkey % 997 = 0",
    "sessionize_events": "event_id % 997 = 0",
    "window_moving_avg": "event_id % 997 = 0",
    "kleene_logic": "event_id % 997 = 0",
    "fillna_ffill_bfill": "event_id % 997 = 0",
    "str_extractall_tokens": "doc_id % 997 = 0",
    "events_session_window": "s_start_s % 997 = 0",
    "scd2_type_history": "user_id % 97 = 0",
    "temporal_state_join": "user_id % 97 = 0",
    "privacy_pseudonymize": "substr(user_token, 1, 2) = 'ab'",
    "arith_null_propagation": "l_orderkey % 1997 = 0",
    "comparison_ops": "l_orderkey % 1997 = 0",
    "cast_astype": "l_orderkey % 1997 = 0",
    "explode_flatten": "vec_id % 97 = 0",
}


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else os.path.join(REPO, ".tmp", "sf10")
    names = sys.argv[2:] or list(SLICES)

    import duckdb
    from pyspark.sql import SparkSession

    from fletcher_spark.queries import registry
    from fletcher_spark.session import apply_runtime_confs
    from tests.conftest import TABLES, pandas_canon

    registry.load_all()
    spark = (
        SparkSession.builder.appName("fulltable-scale")
        .master("local[32]")
        .config("spark.ui.showConsoleProgress", "false")
        .config("spark.sql.shuffle.partitions", "320")
        .config("spark.driver.memory", "8g")
        .getOrCreate()
    )
    apply_runtime_confs(spark)
    spark.sparkContext.setLogLevel("ERROR")
    duck = duckdb.connect()
    if os.environ.get("DUCKDB_MEM"):
        duck.sql(f"SET memory_limit='{os.environ['DUCKDB_MEM']}'")
    duck.sql("SET temp_directory='.tmp'")
    duck.sql(
        f"SET max_temp_directory_size='{os.environ.get('DUCKDB_TEMP_CAP', '30GB')}'"
    )
    for t in TABLES:
        p = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(p):
            duck.sql(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")

    bad = 0
    for name in names:
        pred = SLICES[name]
        t0 = time.time()
        n_s = registry.QUERIES[name](spark, sf_dir).count()
        n_o = duck.sql(f"SELECT count(*) FROM ({registry.ORACLE[name]})").fetchone()[0]
        rows_ok = n_s == n_o
        pdf_s = registry.QUERIES[name](spark, sf_dir).filter(pred).toPandas()
        pdf_o = duck.sql(
            f"SELECT * FROM ({registry.ORACLE[name]}) WHERE {pred}"
        ).df()
        rows_s, cols_s = pandas_canon(pdf_s, name)
        rows_o, cols_o = pandas_canon(pdf_o, name)
        slice_ok = rows_s == rows_o and cols_s == cols_o
        bad += not (rows_ok and slice_ok)
        print(
            f"{'OK' if rows_ok and slice_ok else 'FAIL'} {name}: "
            f"rows={n_s}/{n_o} slice={len(rows_s)}/{len(rows_o)} "
            f"slice_values={'match' if slice_ok else 'DIFFER'} "
            f"({time.time() - t0:.1f}s)",
            flush=True,
        )
        if not slice_ok and cols_s == cols_o and len(rows_s) == len(rows_o):
            diff = [i for i, (a, b) in enumerate(zip(rows_s, rows_o)) if a != b][:1]
            for i in diff:
                print(f"  spark : {rows_s[i]}\n  oracle: {rows_o[i]}")
    print(f"\n{len(names) - bad}/{len(names)} green")
    spark.stop()
    return 1 if bad else 0


if __name__ == "__main__":
    raise SystemExit(main())

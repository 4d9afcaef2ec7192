"""Name-targeted oracle check: drive_driver.py's exact comparison
(PLAIN SparkSession, DuckDB views over sf0.01, pandas_canon) for just
the named queries — the cheap per-change verification loop the
optimization round needs between full sweeps.

Usage: python tools/check_queries.py [--sf DIR] <query> [<query> ...]
"""
import os
import sys
import traceback

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb
from pyspark.sql import SparkSession


def main() -> int:
    args = sys.argv[1:]
    sf = "/root/testdata/sf0.01"
    if args and args[0] == "--sf":
        sf = args[1]
        args = args[2:]
    names = args

    spark = (
        SparkSession.builder.master("local[8]")
        .config("spark.sql.shuffle.partitions", "16")
        .config("spark.ui.showConsoleProgress", "false")
        .appName("check-queries")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    import __spark_entry__ as e
    from tests.conftest import TABLES, pandas_canon

    duck = duckdb.connect()
    for t in TABLES:
        duck.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf}/{t}.parquet'")
    qs, oracles = e.queries(), e.oracle_sql()
    bad = 0
    for name in names:
        if name not in qs:
            print(f"UNKNOWN {name}")
            bad += 1
            continue
        try:
            ps = qs[name](spark, sf).toPandas()
            if name not in oracles:
                print(f"ROWSONLY {name}: {len(ps)} rows", flush=True)
                continue
            po = duck.sql(oracles[name]).df()
            rs, cs = pandas_canon(ps, name)
            ro, co = pandas_canon(po, name)
            if not (cs == co and rs == ro):
                bad += 1
                print(
                    f"FAIL {name}: rows {len(rs)}/{len(ro)} cols_match={cs == co}",
                    flush=True,
                )
            else:
                print(f"OK {name}: {len(rs)} rows", flush=True)
        except Exception:
            bad += 1
            print(
                f"ERR {name}: {traceback.format_exc(limit=2).splitlines()[-1]}",
                flush=True,
            )
    print(f"SUMMARY: {len(names) - bad}/{len(names)} green", flush=True)
    spark.stop()
    return 1 if bad else 0


if __name__ == "__main__":
    raise SystemExit(main())

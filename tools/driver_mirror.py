"""Local mirror of the driver's correctness sweep at sf0.01.

The pytest oracle-contract gate runs at sf0.001 for speed; the driver
scores at sf0.01, where LIMIT ties, empty groups, and value ranges can
differ.  This script replays the driver's exact shape — the first N
queries of ``__spark_entry__.queries()`` (the rotation window) against
``oracle_sql()`` on DuckDB — through the same pandas canonicalization
``tests/conftest.py`` uses, and prints one status line per query.

Usage:  python tools/driver_mirror.py [N] [sf_dir] [offset]
"""

from __future__ import annotations

import os
import sys
import time
import traceback

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 50
    sf_dir = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.01"

    import duckdb

    import __spark_entry__ as e
    from fletcher_spark.session import get_spark
    from tests.conftest import TABLES, pandas_canon

    spark = get_spark("driver-mirror", master="local[8]", shuffle_partitions=16)
    duck = duckdb.connect()
    for t in TABLES:
        duck.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")

    qs = e.queries()
    oracles = e.oracle_sql()
    off = int(sys.argv[3]) if len(sys.argv) > 3 else 0
    names = list(qs)[off:off + n]
    bad = 0
    for name in names:
        t0 = time.time()
        try:
            pdf_s = qs[name](spark, sf_dir).toPandas()
            if name not in oracles:
                print(f"ROWSONLY {name}: spark_rows={len(pdf_s)} ({time.time()-t0:.1f}s)")
                continue
            pdf_o = duck.sql(oracles[name]).df()
            rows_s, cols_s = pandas_canon(pdf_s, name)
            rows_o, cols_o = pandas_canon(pdf_o, name)
            ok_rows = len(rows_s) == len(rows_o)
            ok_cols = cols_s == cols_o
            ok_hash = rows_s == rows_o
            status = "OK" if (ok_rows and ok_cols and ok_hash) else "FAIL"
            if status == "FAIL":
                bad += 1
                detail = f" rows={len(rows_s)}/{len(rows_o)} cols_match={ok_cols}"
                if ok_rows and ok_cols:
                    diff = [i for i, (a, b) in enumerate(zip(rows_s, rows_o)) if a != b][:3]
                    detail += f" first_diff_rows={diff}"
                    for i in diff[:1]:
                        detail += f"\n  spark : {rows_s[i]}\n  oracle: {rows_o[i]}"
            else:
                detail = f" rows={len(rows_s)}"
            print(f"{status} {name}:{detail} ({time.time()-t0:.1f}s)", flush=True)
        except Exception:
            bad += 1
            print(f"ERR {name}: {traceback.format_exc(limit=3).splitlines()[-1]}", flush=True)
    print(f"\n{len(names) - bad}/{len(names)} green")
    spark.stop()
    return 1 if bad else 0


if __name__ == "__main__":
    raise SystemExit(main())

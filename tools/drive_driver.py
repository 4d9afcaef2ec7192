"""Driver simulation per .claude/skills/verify: PLAIN SparkSession (no
fletcher_spark factory), entry smoke x2, full oracle sweep at sf0.01."""
import sys, time, traceback
sys.path.insert(0, __import__("os").path.dirname(__import__("os").path.dirname(__import__("os").path.abspath(__file__))))
import duckdb
from pyspark.sql import SparkSession

spark = (SparkSession.builder.master("local[8]")
         .config("spark.sql.shuffle.partitions", "16")
         .appName("driver-sim").getOrCreate())
import __spark_entry__ as e
from tests.conftest import TABLES, pandas_canon

r1 = e.entry(spark); s1 = r1.schema; n1 = len(r1.collect())
r2 = e.entry(spark); assert r2.schema == s1 and len(r2.collect()) == n1
print(f"entry smoke: {n1} rows, schema stable", flush=True)

sf = "/root/testdata/sf0.01"
duck = duckdb.connect()
for t in TABLES:
    duck.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf}/{t}.parquet'")
qs, oracles = e.queries(), e.oracle_sql()
bad = 0
for name, fn in qs.items():
    try:
        ps = fn(spark, sf).toPandas()
        if name not in oracles:
            print(f"ROWSONLY {name}: {len(ps)} rows", flush=True); continue
        po = duck.sql(oracles[name]).df()
        rs, cs = pandas_canon(ps, name); ro, co = pandas_canon(po, name)
        if not (cs == co and rs == ro):
            bad += 1
            print(f"FAIL {name}: rows {len(rs)}/{len(ro)} cols_match={cs==co}", flush=True)
        else:
            print(f"OK {name}: {len(rs)} rows", flush=True)
    except Exception:
        bad += 1
        print(f"ERR {name}: {traceback.format_exc(limit=2).splitlines()[-1]}", flush=True)
print(f"SUMMARY: {len(qs)-bad}/{len(qs)} green", flush=True)
spark.stop()
sys.exit(1 if bad else 0)

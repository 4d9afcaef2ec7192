"""Reference-shaped string benchmarks.

The reference's asv text suite (workload definitions in BASELINE.md;
/root/reference/benchmarks/text.py) measures the str-accessor surface
on two shapes:

* **accessor grid** — 2^17 rows of ``str(x)*3``, 1-in-7 null
  (generator text.py:11-15), ~40 functions;
* **KMP-adversarial** — 2^16 rows × ~255-byte strings of ``'a'*255``
  with pattern ``'a'*30 + 'b'`` (text.py:18-59) — worst case for naive
  substring scans.

The reference never published absolute numbers (BASELINE.md), so this
script records OUR wall times on ITS workload shapes for the bench
log.  Run: ``python benchmarks/text_shapes.py`` → one JSON line.

Data is generated server-side (spark.range → expressions) — no driver
materialization.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from pyspark.sql import functions as F

from fletcher_spark.operators import strings as S
from fletcher_spark.session import get_spark


def main() -> None:
    spark = get_spark("text-shapes-bench", master="local[32]")
    spark.sparkContext.setLogLevel("ERROR")

    # accessor grid shape: str(x)*3, 1-in-7 null, 2^17 rows
    grid = spark.range(2**17).select(
        F.when(
            F.col("id") % 7 != 0, F.repeat(F.col("id").cast("string"), 3)
        ).alias("s")
    )
    grid.cache().count()

    # KMP-adversarial shape: 'a'*255, pattern 'a'*30+'b', 2^16 rows
    adv = spark.range(2**16).select(F.lit("a" * 255).alias("s"))
    adv.cache().count()
    pat = "a" * 30 + "b"

    def t(df, col) -> float:
        t0 = time.perf_counter()
        df.select(col.alias("o")).write.mode("overwrite").format("noop").save()
        return round(time.perf_counter() - t0, 4)

    timings = {
        # accessor grid (reference benchmarks/text.py:62-561 analog)
        "grid_contains": t(grid, S.contains("s", "11")),
        "grid_count": t(grid, S.count_occurrences("s", "1")),
        "grid_replace_all": t(grid, S.replace("s", "1", "x")),
        "grid_replace_first2": t(grid, S.replace("s", "1", "x", n=2)),
        "grid_slice_step": t(grid, S.slice_codepoints("s", 1, None, 2)),
        "grid_zfill": t(grid, S.zfill("s", 20)),
        "grid_strip": t(grid, S.strip("s", "0")),
        "grid_startswith": t(grid, S.startswith("s", "1")),
        "grid_isdigit": t(grid, S.isdigit("s")),
        "grid_upper_lower": t(grid, S.lower(S.upper("s"))),
        "grid_cat": t(grid, S.cat("s", "s")),
        "grid_len": t(grid, S.length("s")),
        # KMP-adversarial (reference benchmarks/text.py:18-59 analog)
        "adv_contains": t(adv, S.contains("s", pat)),
        "adv_count": t(adv, S.count_occurrences("s", pat)),
        "adv_replace": t(adv, S.replace("s", pat, "z")),
    }
    total = round(sum(timings.values()), 3)
    print(
        json.dumps(
            {
                "metric": "reference_text_shapes_total_wall",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "rows": {"grid": 2**17, "adversarial": 2**16},
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()

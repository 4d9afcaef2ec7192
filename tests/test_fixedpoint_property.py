"""Soundness of the exact fixed-point accumulation (r13).

q1_pricing_summary, cube/pivot_status_priority, conditional_agg_filter
and ``tumbling_agg(value_decimal_scale=…)`` all replace double sums of
money columns with associative BIGINT sums of per-row scaled integers
obtained as ``floor(x·10^s + 0.5)``.  The whole construction rests on
one numeric claim, stated in SCALE.md and the q1 docstring but — until
this file — not pinned by a test:

    for every value the TPC-H-ish generators can emit, the per-row
    double (or double product) sits close enough to its exact
    fixed-point target that ``floor(x·10^s + 0.5)`` recovers the exact
    scaled integer — i.e. the floor is UNAMBIGUOUS.

The three shapes in production:

* 2-decimal stored columns (quantity/price/discount/tax, events.value):
  x is the nearest double to k/100 → ``floor(x·100 + 0.5) == k``.
* the 4-decimal product price·(1−discount): both factors are 2-decimal,
  so the exact value is a 4-decimal number; the IEEE double product
  carries ≤ 3 roundings (~1e-6 in 1e-4 units at 1e5 magnitudes —
  measured ~5e-5 worst-case in SCALE.md's sf10 probe, bound 0.5).
* the 6-decimal charge price·(1−d)·(1+tax), left-associated exactly as
  both the Spark Column expression and the DuckDB oracle write it.

Hypothesis sweeps the generator domains well past sf10 magnitudes; the
Spark-side test then pins ``tumbling_agg``'s exact-mean output against
an integer-arithmetic reference computed with the same final IEEE ops,
under three different partition layouts (associativity = the property
that makes the sum bit-reproducible under ANY shuffle width).
"""

from __future__ import annotations

import math

from hypothesis import given, settings
from hypothesis import strategies as st

# TPC-H-ish magnitudes with headroom: extendedprice tops out ~1.1e5;
# sweep cents to 1e9 (=$10M per row, ~100× headroom).  Discount/tax
# are 0.00–0.10 / 0.00–0.08 in the spec; sweep the full 2-decimal
# [0, 1) range.
CENTS = st.integers(min_value=0, max_value=10**9)
HUNDREDTHS = st.integers(min_value=0, max_value=99)


def fx(x: float, scale: int) -> int:
    """Python twin of the Column/SQL form floor(x·scale + 0.5): both
    engines evaluate it with the same IEEE double multiply/add."""
    return math.floor(x * scale + 0.5)


@settings(max_examples=2000, deadline=None)
@given(k=CENTS)
def test_two_decimal_floor_recovers_exact_cents(k: int):
    # stored column: the parquet double is the nearest double to k/100
    assert fx(k / 100, 100) == k


@settings(max_examples=2000, deadline=None)
@given(a=CENTS, b=HUNDREDTHS)
def test_four_decimal_product_floor_unambiguous(a: int, b: int):
    # price·(1−discount): exact value is a·(100−b) in 1e-4 units; the
    # double product is (a/100)⊗(1⊖b/100) with ≤3 roundings
    prod = (a / 100) * (1 - b / 100)
    assert fx(prod, 10000) == a * (100 - b)


@settings(max_examples=2000, deadline=None)
@given(a=CENTS, b=HUNDREDTHS, c=HUNDREDTHS)
def test_six_decimal_charge_floor_unambiguous(a: int, b: int, c: int):
    # price·(1−d)·(1+t), left-associated as in both engines' SQL
    prod = (a / 100) * (1 - b / 100) * (1 + c / 100)
    assert fx(prod, 1000000) == a * (100 - b) * (100 + c)


@settings(max_examples=500, deadline=None)
@given(ks=st.lists(CENTS, min_size=1, max_size=50))
def test_exact_mean_matches_integer_reference(ks: list[int]):
    # the final ops tumbling_agg/q1 emit: int sum → double, two IEEE
    # divisions — deterministic for ANY accumulation order by
    # construction (the sum is over BIGINTs)
    mean = float(sum(fx(k / 100, 100) for k in ks)) / 100.0 / len(ks)
    assert mean == float(sum(ks)) / 100.0 / len(ks)


def test_tumbling_exact_mean_partition_invariant(spark):
    """tumbling_agg's value_decimal_scale path: output equals the
    integer-arithmetic reference and is byte-identical under 1-, 3-,
    and 17-partition layouts (associative BIGINT sum ⇒ the shuffle
    width can't reorder anything observable)."""
    import pandas as pd
    from pyspark.sql import functions as F

    from fletcher_spark.streaming.windows import tumbling_agg

    # two windows, values chosen to land mean ties (12.94875-style):
    # window A holds 8 values summing to 10359 cents (mean 12.94875)
    cents_a = [1294, 1295, 1294, 1295, 1295, 1295, 1295, 1296]
    assert sum(cents_a) == 10359
    cents_b = [100, 250, 333]
    pdf = pd.DataFrame(
        {
            "ts": (
                [pd.Timestamp("2024-01-01 00:01:00")] * len(cents_a)
                + [pd.Timestamp("2024-01-01 00:11:00")] * len(cents_b)
            ),
            "event_type": ["x"] * (len(cents_a) + len(cents_b)),
            "value": [k / 100 for k in cents_a + cents_b],
        }
    )
    expected = {
        pd.Timestamp("2024-01-01 00:00:00"): float(10359) / 100.0 / len(cents_a),
        pd.Timestamp("2024-01-01 00:10:00"): float(sum(cents_b)) / 100.0 / len(cents_b),
    }

    outs = []
    for parts in (1, 3, 17):
        df = spark.createDataFrame(pdf).repartition(parts)
        out = (
            tumbling_agg(df, "ts", "10 minutes", "event_type", value_decimal_scale=2)
            .orderBy("w_start")
            .select("w_start", "n", F.col("avg_value"))
            .toPandas()
        )
        outs.append(out)
    for out in outs:
        got = dict(zip(out["w_start"], out["avg_value"]))
        assert got == expected  # exact float equality, no tolerance
    # byte-identical across layouts
    assert outs[0].equals(outs[1]) and outs[1].equals(outs[2])

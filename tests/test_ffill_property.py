"""Property test: keyed forward/backward fill (operators/core.ffill /
bfill) vs pandas ``groupby.ffill``/``bfill``.

The fixed-data oracle (fillna_ffill_bfill) runs on a table whose
null/order pattern is static; hypothesis generates batches with null
runs at the partition edges (leading nulls stay null after ffill,
trailing nulls after bfill), all-null keys, and single-row groups.
A unique, explicitly generated order column keeps both engines'
orderings identical (Spark's window sort is not stable across ties).
"""

from __future__ import annotations

import pandas as pd
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from fletcher_spark.operators.core import bfill, ffill

st_key = st.integers(min_value=0, max_value=2)
st_val = st.one_of(st.none(), st.integers(min_value=-9, max_value=9))
st_rows = st.lists(st.tuples(st_key, st_val), min_size=1, max_size=16)

SETTINGS = settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow, HealthCheck.function_scoped_fixture],
)


@given(rows=st_rows)
@SETTINGS
def test_ffill_bfill_match_pandas(spark, rows):
    data = [(k, i, v) for i, (k, v) in enumerate(rows)]
    df = spark.createDataFrame(data, "k bigint, ord bigint, v bigint")

    pdf = pd.DataFrame(data, columns=["k", "ord", "v"]).astype({"v": "Int64"})
    pdf = pdf.sort_values(["k", "ord"])

    for fn, pd_method in ((ffill, "ffill"), (bfill, "bfill")):
        got = {
            (r["k"], r["ord"]): r["v"]
            for r in fn(df, "v", order=["ord"], partition=["k"]).collect()
        }
        filled = getattr(pdf.groupby("k")["v"], pd_method)()
        for (k, o), exp in zip(pdf[["k", "ord"]].itertuples(index=False), filled):
            exp = None if pd.isna(exp) else int(exp)
            assert got[(k, o)] == exp, (pd_method, rows, k, o)

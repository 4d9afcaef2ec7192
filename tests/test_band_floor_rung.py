"""End-to-end cross-engine value check of the LSH_BAND_LADDER's 2×6
FLOOR rung (VERDICT r12 ask #2).

The floor activates above the last ladder threshold (2M docs in
production) — no generated corpus reaches it, so until now it carried
only unit-level rung-wiring pins.  Both the Spark renderer
(``lsh_band_keys_adaptive_sql``) and the DuckDB oracle renderer
(``lsh_rpb_case_sql``) derive from the SAME module constants, so
monkeypatching the thresholds down makes the sf0.01 corpus (500 docs)
trip the floor in BOTH engines; the full query-vs-oracle comparison
then holds the 2×6 branch to the same hash-match standard the 4×3 and
3×4 rungs met at .tmp scales.
"""

from __future__ import annotations

import duckdb
import pytest

from fletcher_spark.pipeline import dedup as D

SF_DIR = "/root/testdata/sf0.01"

#: thresholds shrunk so 500 docs overshoot the ladder: 4×3 below 50,
#: 3×4 below 200, FLOOR 2×6 above — every rung satisfies the module's
#: import-time invariants (bands == 12 // rows, bands <= 4)
TEST_LADDER = ((50, 4, 3), (200, 3, 4))


@pytest.mark.parametrize("qname", ["dedup_minhash_lsh", "dedup_cc_clusters"])
def test_floor_rung_2x6_cross_engine(spark, monkeypatch, qname):
    from fletcher_spark.queries import registry
    from tests.conftest import pandas_canon

    registry.load_all()

    # the production oracle text was rendered at import time with the
    # real ladder; swap in the CASE rendered under the test ladder so
    # both engines band with the SAME shrunken thresholds
    prod_case = D.lsh_rpb_case_sql("count(*)")
    monkeypatch.setattr(D, "LSH_BAND_LADDER", TEST_LADDER)
    test_case = D.lsh_rpb_case_sql("count(*)")
    assert "THEN 6" in test_case or "ELSE 6" in test_case or test_case.endswith("6 END)") or "6 END" in test_case

    oracle = registry.ORACLE[qname]
    assert prod_case in oracle, "oracle no longer embeds the ladder CASE"
    oracle = oracle.replace(prod_case, test_case)

    # the Spark side picks the ladder up at CONSTRUCTION time
    got = registry.QUERIES[qname](spark, SF_DIR).toPandas()

    con = duckdb.connect()
    for t in ("documents",):
        con.sql(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF_DIR}/{t}.parquet')"
        )
    exp = con.sql(oracle).df()

    # sanity: the floor rung really ran — 2 bands of 6 rows is far more
    # selective than 4×3, and the exact-verify keeps true near-dups, so
    # the result must be non-vacuous for the check to mean anything
    assert len(exp) > 0, "floor-rung corpus produced no pairs — vacuous"

    g_rows, g_cols = pandas_canon(got, qname)
    e_rows, e_cols = pandas_canon(exp, qname)
    assert g_cols == e_cols
    assert g_rows == e_rows

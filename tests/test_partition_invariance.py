"""Results must not depend on the cluster's shuffle width.

On a real cluster ``spark.sql.shuffle.partitions`` is hundreds-to-
thousands and varies by deployment; any query whose OUTPUT changes with
it (float summation order surfacing above the rounding contract,
under-determined window orderings, first()/head-style nondeterminism)
is silently wrong at scale even when it passes a single-config oracle
check.  This sweep re-runs a representative slice of the registry —
window ranks, collect_list repacks, hash sampling, LSH banding, salted
ranking, grouped-map Arrow kernels, sketches — under deliberately
awkward widths (3 and 17, neither a divisor of anything) and asserts
byte-identical canonicalized output.  The cache is cleared between
runs so persisted sub-plans genuinely re-execute at the new width.
"""

from __future__ import annotations

import pytest

from fletcher_spark.queries import registry
from tests.conftest import pandas_canon

registry.load_all()

SF_DIR = "/root/testdata/sf0.001"

NAMES = [
    "q1_pricing_summary",
    "factorize_dense_codes",
    "window_topk_per_group",
    "sample_weighted_aes",
    "events_session_window",
    "dedup_minhash_lsh",
    "dedup_prefix_filter_join",
    "sketch_kmv_distinct",
    "udf_grouped_map_zscore",
    "ann_pq_adc",
    # round-5 additions: cut-point rank arithmetic, TTL chain replay,
    # the bucketed gap scan, and the sketch-bound check must all be
    # width-independent (counts and value picks only)
    "histogram_equidepth_cuts",
    "events_rfm_segments_cuts",
    "docid_gap_ranges_bucketed",
    "events_ttl_first_seen",
    "sketch_quantile_bound",
    # r13: the old double-sum alloc flipped floor(…)=49/50 with the
    # partial-aggregate grouping at the 100× ledger sweep; the integer
    # milli-sqrt rewrite must be width-independent by construction
    "mix_temperature_sampling",
]


@pytest.mark.parametrize("name", NAMES)
def test_output_invariant_under_shuffle_width(spark, name):
    baseline = spark.conf.get("spark.sql.shuffle.partitions")
    results = {}
    try:
        for width in ("3", "17"):
            spark.conf.set("spark.sql.shuffle.partitions", width)
            spark.catalog.clearCache()
            df = registry.QUERIES[name](spark, SF_DIR)
            results[width] = pandas_canon(df.toPandas(), name)
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", baseline)
        spark.catalog.clearCache()
    assert results["3"] == results["17"], name

"""Opt-in 10× scale-ratio regression tests (``pytest -m scale``).

Wraps tools/scale_probe.py on a reduced query set and asserts each
query's sf0.1 → sf1 wall-clock ratio stays under a recorded bound, so
a regression in a banding/bucketing/cascade bound fails a test instead
of waiting for the next judge round (VERDICT r7 ask #5).

Runs in a SUBPROCESS on purpose: the probe needs
``spark.driver.memory=48g`` (the sf1 working sets blow the 1g
local-mode default), and driver memory is fixed at JVM launch — the
pytest session's already-running Spark JVM can't be reconfigured.

Deselected by default via pytest.ini's ``-m "not scale"`` addopts; the
probe takes minutes and needs/creates the gitignored ``.tmp/sf1``
scratch (~150 MB).
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
PROBE = os.path.join(REPO, "tools", "scale_probe.py")
SF1 = os.path.join(REPO, ".tmp", "sf1")

# ratio bound = measured ratio (SCALE.md r7/r8 probe tables) + headroom
# for probe noise and box contention.  10× data on 32 cores: anything
# ≤ ~12 is at-most-linear; the bounds are per-query because baseline
# wall-clocks differ by 10× (sub-second queries carry scheduling noise).
BOUNDS = {
    # the r7 scale-killer, cap-64 default (measured 4.04× at 10×, r8)
    "dedup_levenshtein_block": 12.0,
    # highest extended-sweep ratio (4.84× r7); prefix-filter bound
    "dedup_prefix_filter_join": 10.0,
    # banded MinHash-LSH (2.85× r7) — the flagship near-dup bound
    "dedup_minhash_lsh": 7.0,
    # multi-stage curation pipeline (4.35× r7, cores idle at sf0.1)
    "pipeline_curate_corpus": 9.0,
    # the r8 scale-killer fix: time-bucketed binning (measured 1.92×
    # at 10×; the pre-fix residual-only join measured 13.15×)
    "range_join_follows": 6.0,
    # closed-form suffix-weight EWMA (measured 1.24× at 10×, r9; the
    # per-segment applyInPandas version it replaced measured 3.51×
    # with 5× the absolute wall)
    "ewma_segmented": 5.0,
    # hash-min connected components over banded candidates (2.05× r10,
    # 4.74× r7 — ≤ linear in 10× edges; bound keeps r7-style headroom)
    "dedup_cc_clusters": 12.0,
    # corpus-size-adaptive LSH key width (r10): the sf1 tier gets 8-bit
    # buckets vs sf0.1's 4-bit, so the measured 10× ratio is 0.80 —
    # SUB-1; the bound guards the adaptive ladder itself (a regression
    # to fixed-width keys measured DNF at 100× and ~2× here)
    "ann_lsh_bucketed": 4.0,
    # the other three width-ladder queries (r10): measured 1.02 / 1.21 /
    # 1.35 at 10× — near-flat because the ladder widens with the corpus;
    # their fixed-granularity forms measured 448× / 108× / 239× at 100×,
    # so these bounds are the regression guard for the whole genus
    "dedup_embedding_cosine": 5.0,
    "ann_ivf_probe": 5.0,
    "ann_ivf_int8_rescore": 5.0,
    # (label, sub)-blocked numpy kNN kernel (r10): 1.14 at 10×; the
    # label-only blocking it replaced was N²·d/10 FLOPs by construction
    "knn_graph_blocked": 5.0,
    # the three full-registry-sweep fixes (r10 second session) — bounds
    # guard the fixed plan shapes, measured at 10×: in-array mode fold
    # (1.39×; the explode-shuffle form it replaced measured 52× at
    # 100×), pre-aggregated FK audit join (1.12×; row-level join form
    # 54× at 100×), hashed-shingle shuffle keys (2.94×)
    "text_repetition": 5.0,
    "fk_orphan_audit": 5.0,
    "text_boilerplate_ratio": 7.0,
}


TABLES = (
    "region nation customer supplier part orders lineitem events "
    "documents embeddings"
).split()


@pytest.mark.scale
def test_scale_probe_ratios_within_bounds():
    # gate on gen()'s completion sentinel (written after the LAST
    # table), not the directory or even the file set: an interrupted
    # generation can leave a torn final parquet behind an
    # otherwise-complete-looking set
    if not os.path.isfile(os.path.join(SF1, "_SUCCESS")) or not all(
        os.path.isfile(os.path.join(SF1, f"{t}.parquet")) for t in TABLES
    ):
        gen = subprocess.run(
            [sys.executable, PROBE, "gen"],
            capture_output=True,
            text=True,
            timeout=1800,
        )
        assert gen.returncode == 0, gen.stderr[-2000:]
    def probe(names):
        run = subprocess.run(
            [sys.executable, PROBE, "run", ",".join(names)],
            capture_output=True,
            text=True,
            timeout=3600,
        )
        assert run.returncode == 0, run.stderr[-2000:]
        # the probe prints a human table then one JSON line
        json_line = next(
            ln
            for ln in reversed(run.stdout.strip().splitlines())
            if ln.startswith("{")
        )
        return json.loads(json_line)

    out = probe(BOUNDS)
    failures = {
        name: ratio for name, (_, _, ratio) in out.items() if ratio > BOUNDS[name]
    }
    if failures:
        # the probe's min-of-2 absorbs scheduler jitter but not a
        # SUSTAINED contention burst spanning both samples (observed:
        # a tier run that took 3x its normal wall broke a bound that
        # passed on direct re-probe minutes later) — re-probe just the
        # exceeders once before declaring a regression.  The RETRY must
        # pass with margin (ratio <= 0.9*bound): a query whose true
        # ratio hovers AT its bound would otherwise pass whenever either
        # of two runs lands under it, doubling the false-negative rate
        # exactly at the regression boundary this tier guards (ADVICE
        # r9).  Both runs' ratios are printed so a persistent near-bound
        # drift stays visible in CI logs even when the retry passes.
        out2 = probe(sorted(failures))
        for name in sorted(failures):
            print(
                f"scale-probe retry {name}: run1 ratio {failures[name]:.2f} "
                f"> bound {BOUNDS[name]:.1f}; run2 ratio "
                f"{out2[name][2]:.2f} (retry margin {0.9 * BOUNDS[name]:.2f})"
            )
        failures = {
            name: (failures[name], ratio)
            for name, (_, _, ratio) in out2.items()
            if ratio > 0.9 * BOUNDS[name]
        }
    assert not failures, (
        f"scale ratios exceeded recorded bounds (10x data) — first run "
        f"over the bound, retry over 0.9x the bound "
        f"{{name: (run1_ratio, run2_ratio)}}: {failures}; "
        f"first-run output: {out}"
    )


@pytest.mark.scale
def test_minhash_candidate_volume_linear_at_10x():
    """Noise-free companion to the wall-clock bounds (r11 adjudication):
    dedup_minhash_lsh's LSH band keys are md5-derived, so candidate
    counts are DETERMINISTIC per corpus — pin the exact sf0.1 and sf1
    volumes and the ≤ linear growth the adjudication measured
    (12 758 → 128 703 = ×10.09 for 10× docs; the +0.9% over ×10 is the
    within-copy random-collision rate, itself linear because scale
    copies are similarity-disjoint).  A regression re-introducing
    occupancy growth (e.g. a fixed-granularity band key) fails here
    deterministically instead of through a wall-clock bound."""
    if not os.path.isfile(os.path.join(SF1, "_SUCCESS")):
        pytest.skip("no .tmp/sf1 scratch (run the ratio test first)")
    code = r"""
import sys
sys.path.insert(0, %r)
from pyspark.sql import SparkSession, functions as F
from fletcher_spark.io import load_tables, spread
from fletcher_spark.pipeline import dedup as D
from fletcher_spark.session import apply_runtime_confs
spark = (SparkSession.builder.master("local[32]")
         .config("spark.sql.shuffle.partitions", "32")
         .config("spark.driver.memory", "24g")
         .config("spark.ui.showConsoleProgress", "false").getOrCreate())
apply_runtime_confs(spark)
spark.sparkContext.setLogLevel("ERROR")
for sf in ("/root/testdata/sf0.1", %r):
    d = spread(load_tables(spark, sf)["documents"])
    n = d.agg(F.count(F.lit(1)).alias("__n"))
    sh = D.shingle_frame(d, "text", 3).persist()
    sig = D.minhash_signature_df(sh, "doc_id", "shingles", 12).persist()
    banded = sig.select("doc_id", D.lsh_band_keys(F.col("sig"), 4, 3).alias("band_keys"))
    print("NCAND", sf, D.candidate_pairs(banded, "doc_id").count())
    adaptive = sig.crossJoin(F.broadcast(n)).select(
        "doc_id", D.lsh_band_keys_adaptive(F.col("sig"), F.col("__n")).alias("band_keys"))
    print("NADPT", sf, D.candidate_pairs(adaptive, "doc_id").count())
    sig.unpersist(); sh.unpersist()
spark.stop()
""" % (REPO, SF1)
    run = subprocess.run(
        [sys.executable, "-c", code], capture_output=True, text=True, timeout=1200
    )
    assert run.returncode == 0, run.stderr[-2000:]
    counts = {
        parts[1]: int(parts[2])
        for ln in run.stdout.splitlines()
        if ln.startswith("NCAND") and (parts := ln.split())
    }
    adpt = {
        parts[1]: int(parts[2])
        for ln in run.stdout.splitlines()
        if ln.startswith("NADPT") and (parts := ln.split())
    }
    # Two distinct claims, asserted separately (ADVICE r11): the RATIO
    # bounds are the linearity adjudication — a fixed-granularity band
    # key regression trips them; the exact pins merely freeze the
    # byte-exact corpus + md5 band keys, and a benign generator or
    # shingle-normalization change trips only them.
    ratio = counts[SF1] / counts["/root/testdata/sf0.1"]
    assert ratio <= 10.2, (
        f"LINEARITY REGRESSION: candidate growth x{ratio:.2f} for x10 docs "
        f"exceeds the linear bound (r11 adjudication measured x10.09): {counts}"
    )
    # Broder re-band (r12, VERDICT ask #2): at sf0.1 the adaptive layout
    # IS the fixed 4×3 (base-branch identity, bit-for-bit); at sf1 the
    # 3×4 rung must not exceed the fixed layout's volume — rows-per-band
    # is the selectivity knob, so re-banding can only tighten it.
    assert adpt["/root/testdata/sf0.1"] == counts["/root/testdata/sf0.1"], (
        f"adaptive layout diverged from 4×3 on the BASE branch: {adpt} vs {counts}"
    )
    a_ratio = adpt[SF1] / adpt["/root/testdata/sf0.1"]
    assert adpt[SF1] <= counts[SF1] and a_ratio <= 10.2, (
        f"RE-BAND REGRESSION: 3×4 rung grew candidates past the fixed "
        f"layout ({adpt[SF1]} > {counts[SF1]}) or past linear "
        f"(x{a_ratio:.2f}): {adpt}"
    )
    assert counts["/root/testdata/sf0.1"] == 12758 and counts[SF1] == 128703, (
        f"counts changed (linearity bound still holds, x{ratio:.2f}): the "
        f"corpus generator / shingle normalization / band-key derivation "
        f"moved — re-pin after confirming the cause is benign: {counts}"
    )
    assert adpt[SF1] == 113503, (
        f"re-banded candidate count changed (suppression vs fixed still "
        f"holds, {adpt[SF1]} <= {counts[SF1]}): re-pin after confirming "
        f"the cause is benign: {adpt}"
    )


@pytest.mark.scale
def test_wide_branch_oracle_parity_fast_subset():
    """Re-runnable form of the r11 wide-branch parity check: at
    .tmp/sf1 the bits_case_sql ladder picks widened key widths (3-bit
    IVF sub-shards, 8/11-bit table keys) and the levenshtein cascade's
    deeper levels activate — branches NO driver scale exercises.  This
    tier replays the driver's comparison for the DuckDB-fast subset
    (the full five-query run incl. ann_lsh_bucketed/dedup_embedding_
    cosine costs ~4 min of DuckDB 128-plane dot products; those two
    stay in the recorded one-off — SCALE.md r11), so a regression in
    ladder or cascade code fails a test instead of waiting a round."""
    if not os.path.isfile(os.path.join(SF1, "_SUCCESS")):
        pytest.skip("no .tmp/sf1 scratch (run the ratio test first)")
    run = subprocess.run(
        [
            sys.executable,
            os.path.join(REPO, "tools", "ladder_oracle_check.py"),
            SF1,
            "ann_ivf_probe",
            "ann_ivf_int8_rescore",
            "knn_graph_blocked",
            "dedup_levenshtein_block",
        ],
        capture_output=True,
        text=True,
        timeout=1800,
    )
    assert run.returncode == 0, (run.stdout[-2000:], run.stderr[-1000:])
    assert "4/4 wide-branch hash-matches" in run.stdout, run.stdout[-2000:]


@pytest.mark.scale
def test_wide_branch_oracle_parity_vector_slice():
    """Pulls the two DuckDB-SLOW ladder families into the re-runnable
    tier (VERDICT r11 ask #3): ann_lsh_bucketed and dedup_embedding_
    cosine previously lived only in the recorded one-off because their
    full-sf1 oracles pay ~4 min of 128-plane DuckDB dot products over
    20k vectors.  A deterministic 5,000-vector slice (lowest vec_ids of
    .tmp/sf1) still trips WIDENED CASE branches — 6-bit table keys for
    ann_lsh_bucketed (base 4, sf1 uses 8) and 9-bit for
    dedup_embedding_cosine (base 8, sf1 uses 11), since
    4096 = target·2^b < 5000 ≤ 2·4096 on both ladders — at a quarter
    of the oracle cost, AND pins a THIRD distinct width per family on
    top of the r11 two-scale ledger.  The slice dir carries only
    embeddings.parquet; ladder_oracle_check skips the other views."""
    if not os.path.isfile(os.path.join(SF1, "_SUCCESS")):
        pytest.skip("no .tmp/sf1 scratch (run the ratio test first)")
    import pyarrow.parquet as pq

    slice_dir = os.path.join(REPO, ".tmp", "sf1_slice")
    dst = os.path.join(slice_dir, "embeddings.parquet")
    if not os.path.isfile(dst):
        os.makedirs(slice_dir, exist_ok=True)
        t = pq.read_table(os.path.join(SF1, "embeddings.parquet"))
        t = t.sort_by("vec_id").slice(0, 5000)
        pq.write_table(t, dst)
    assert pq.ParquetFile(dst).metadata.num_rows == 5000

    run = subprocess.run(
        [
            sys.executable,
            os.path.join(REPO, "tools", "ladder_oracle_check.py"),
            slice_dir,
            "ann_lsh_bucketed",
            "dedup_embedding_cosine",
        ],
        capture_output=True,
        text=True,
        timeout=1800,
    )
    assert run.returncode == 0, (run.stdout[-2000:], run.stderr[-1000:])
    assert "2/2 wide-branch hash-matches" in run.stdout, run.stdout[-2000:]

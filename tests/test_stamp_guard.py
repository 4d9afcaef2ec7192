"""Always-on guard that the CHANGED_ROUND rotation cannot drift.

A rewritten query whose change-round isn't recorded keeps its
pre-rewrite green stamp until the full rotation returns — the exact
hole the changed-since-stamp tier was added to close (ADVICE r9).
``tools/stamp_guard.py`` snapshots a source+oracle hash per registered
query; this test fails any tree where a query changed without the
snapshot being refreshed in the same commit.

No SparkSession needed: hashing only imports the query modules.
"""

from __future__ import annotations

import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.join(REPO, "tools"))

import stamp_guard  # noqa: E402


def test_query_source_hashes_match_snapshot():
    changed, new = stamp_guard.drift()
    assert not changed and not new, (
        f"query source drifted from tools/query_src_hashes.json — "
        f"changed: {changed}; new: {new}. Run "
        f"`python tools/stamp_guard.py update` in the SAME commit as the "
        f"query change (it records changed_round so the driver re-stamps "
        f"the rewrite in the next correctness window)."
    )


def test_snapshot_changed_rounds_flow_into_registry():
    from fletcher_spark.queries import registry

    merged = registry.changed_rounds()
    # manual layer survives the merge
    for name, rnd in registry.CHANGED_ROUND.items():
        assert merged.get(name, 0) >= rnd
    # recorded layer survives the merge
    for name, rnd in stamp_guard.load_snapshot().get("changed_rounds", {}).items():
        assert merged.get(name, 0) >= rnd


def test_current_round_derivation(tmp_path):
    # empty repo -> round 1; driver files present -> max+1
    assert stamp_guard.current_round(str(tmp_path)) == 1
    (tmp_path / "CORRECTNESS_r03.json").write_text("{}")
    (tmp_path / "CORRECTNESS_r11.json").write_text("{}")
    assert stamp_guard.current_round(str(tmp_path)) == 12

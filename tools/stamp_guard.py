"""Mechanical CHANGED_ROUND guard (ADVICE r9, registry.py drift risk).

``registry.CHANGED_ROUND`` orders rewritten queries to the front of the
driver's bounded correctness window so they re-earn a post-rewrite
stamp.  Maintained purely by hand, a forgotten entry silently leaves a
rewritten query stamped green by its pre-rewrite verification until the
full rotation returns — exactly the failure mode the tier exists to
close.  This tool makes that drift impossible to miss:

* ``tools/query_src_hashes.json`` snapshots, per registered query, the
  sha256 of its function source (``inspect.getsource``) concatenated
  with its registered oracle SQL.  Function source catches body
  rewrites (including factory-generated families — a shared factory
  change marks every query it emits); the oracle string catches
  comparison-side changes routed through module constants.
* ``python tools/stamp_guard.py check`` (and the always-on
  ``tests/test_stamp_guard.py``) fails when any current hash differs
  from the snapshot — i.e. a query changed without the snapshot (and
  therefore its change-round) being refreshed in the same commit.
* ``python tools/stamp_guard.py update`` refreshes the snapshot and
  records ``changed_round = <current round>`` for every query whose
  hash moved, where the current round is derived from the
  ``CORRECTNESS_r{N}.json`` files the driver leaves in the repo root
  (max N + 1).  Queries appearing for the first time get a hash only:
  the never-verified tier already fronts them, and
  ``INTRODUCED_ROUND`` records their registration.

``registry.changed_rounds()`` merges the snapshot's recorded rounds
with the hand-maintained ``CHANGED_ROUND`` dict (max wins).  The manual
dict remains for the one case hashing can't see: a rewrite of an
*operator module* on a query's path that doesn't touch the query body
or its oracle (e.g. the r8 ``_LEV_BLOCK_CAP`` default change lived in
the dedup operator constants).
"""

from __future__ import annotations

import glob
import hashlib
import inspect
import json
import os
import re
import sys
import textwrap

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SNAPSHOT = os.path.join(os.path.dirname(os.path.abspath(__file__)), "query_src_hashes.json")


def current_round(repo: str = REPO) -> int:
    """Round currently being built: max driver CORRECTNESS round + 1."""
    rounds = [
        int(m.group(1))
        for p in glob.glob(os.path.join(repo, "CORRECTNESS_r*.json"))
        if (m := re.search(r"CORRECTNESS_r(\d+)\.json$", p))
    ]
    return (max(rounds) + 1) if rounds else 1


def compute_hashes() -> dict[str, str]:
    sys.path.insert(0, REPO)
    from fletcher_spark.queries import registry

    registry.load_all()
    out = {}
    for name, fn in registry.QUERIES.items():
        try:
            src = textwrap.dedent(inspect.getsource(fn))
        except (OSError, TypeError):  # builtins/partials: hash the repr shape
            src = repr(fn)
        blob = src + "\x00" + registry.ORACLE.get(name, "")
        out[name] = hashlib.sha256(blob.encode()).hexdigest()
    return out


def load_snapshot() -> dict:
    if not os.path.exists(SNAPSHOT):
        return {"hashes": {}, "changed_rounds": {}}
    with open(SNAPSHOT) as f:
        return json.load(f)


def drift(hashes: dict[str, str] | None = None) -> tuple[list[str], list[str]]:
    """Return (changed, new) query names vs the committed snapshot."""
    snap = load_snapshot()
    hashes = hashes if hashes is not None else compute_hashes()
    old = snap.get("hashes", {})
    changed = sorted(n for n in hashes if n in old and hashes[n] != old[n])
    new = sorted(n for n in hashes if n not in old)
    return changed, new


def update() -> None:
    snap = load_snapshot()
    hashes = compute_hashes()
    changed, new = drift(hashes)
    rnd = current_round()
    changed_rounds = dict(snap.get("changed_rounds", {}))
    for n in changed:
        changed_rounds[n] = rnd
    # drop entries for queries that no longer exist
    changed_rounds = {n: r for n, r in changed_rounds.items() if n in hashes}
    with open(SNAPSHOT, "w") as f:
        json.dump(
            {"hashes": hashes, "changed_rounds": changed_rounds},
            f,
            indent=1,
            sort_keys=True,
        )
        f.write("\n")
    print(
        f"snapshot updated: {len(hashes)} queries; "
        f"{len(changed)} marked changed_round={rnd} {changed}; "
        f"{len(new)} new (hash only)"
    )


def main() -> int:
    mode = sys.argv[1].lstrip("-") if len(sys.argv) > 1 else "check"
    if mode == "update":
        update()
        return 0
    changed, new = drift()
    if changed or new:
        print(
            "stamp_guard: query source drifted from tools/query_src_hashes.json\n"
            f"  changed since snapshot: {changed}\n"
            f"  not in snapshot: {new}\n"
            "Run `python tools/stamp_guard.py update` in the SAME commit as the "
            "query change so the rewrite is fronted for a fresh driver stamp."
        )
        return 1
    print(f"stamp_guard: clean ({len(load_snapshot().get('hashes', {}))} queries)")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())

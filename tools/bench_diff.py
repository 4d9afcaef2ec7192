"""Compare two bench snapshots on their query overlap.

Usage: python tools/bench_diff.py OLD.json NEW.json [ratio_threshold]

Accepts either the driver's BENCH_r{N}.json (with a nested parsed line)
or a raw BENCH.out line.  Prints total-overlap ratio and every query
whose new/old ratio exceeds the threshold (default 1.5) in either
direction — the same regression definition VERDICT reviews use.

When BOTH snapshots carry ``box_ref_sec`` (bench.py's canonical q1
steady-state min-of-3, recorded since r10), the overlap ratio is also
printed NORMALIZED by the box-speed ratio: normalized = raw_ratio /
(new_ref / old_ref).  A raw 1.2x that normalizes to ~1.0x is the box
running slower during the new sweep, not a code regression — the
adjudication that previously took a git-diff + solo re-time cycle.
"""

from __future__ import annotations

import json
import sys


def _load(path: str) -> tuple[dict[str, float], float | None, dict[str, float]]:
    with open(path) as f:
        text = f.read().strip()
    line = text.splitlines()[-1]
    d = json.loads(line if line.startswith("{") else text)
    # driver snapshot wraps the parsed line under "parsed"
    if "queries" not in d and isinstance(d.get("parsed"), dict):
        d = d["parsed"]
    q = d.get("queries") or {}
    ref = d.get("box_ref_sec")
    # In-band drift check (VERDICT r11 ask #4): bench.py samples the q1
    # probe at BOTH ends of the sweep since r12.  The two directions
    # mean different things (measured r12, twice, on a quiet box):
    # post FASTER than pre by ~1.7-1.9x is the normal JVM JIT
    # maturation curve, so only divergence BEYOND that baseline
    # suggests a start-of-sweep burst; post SLOWER than pre has no JIT
    # explanation at all — contention arrived mid-sweep.
    pre, post = d.get("box_ref_pre_sec"), d.get("box_ref_post_sec")
    if "box_ref_post_sec" in d and post is None:
        # bench.py records null when the post probe FAILED (ADVICE r12)
        # — distinct from zero drift, which would read pre == post.
        print(
            f"  WARN  {path}: post box probe failed — intra-sweep drift "
            f"is UNMEASURED for this snapshot (not zero)"
        )
    if isinstance(pre, (int, float)) and isinstance(post, (int, float)) and pre > 0 and post > 0:
        if post > 1.5 * pre:
            print(
                f"  WARN  {path}: box_ref post {post:.2f}s vs pre {pre:.2f}s "
                f"({post / pre:.2f}x slower at end) — contention ARRIVED "
                f"mid-sweep; normalized ratios from this snapshot are suspect"
            )
        elif pre > 2.5 * post:
            print(
                f"  WARN  {path}: box_ref pre {pre:.2f}s vs post {post:.2f}s "
                f"({pre / post:.2f}x) — beyond the ~1.9x JIT-maturation "
                f"baseline; the pre-sweep denominator likely caught a "
                f"contention burst, normalized ratios are suspect"
            )
    # per-query burst flags (bench.py since r13): max/min sample spread
    # > 3x for that query during this sweep — the committed label for
    # the single-family contention bursts r12 adjudicated by hand
    burst = {
        k: float(v)
        for k, v in (d.get("burst_suspect") or {}).items()
        if isinstance(v, (int, float))
    }
    if burst:
        worst = ", ".join(f"{k} {v:.1f}x" for k, v in sorted(burst.items(), key=lambda kv: -kv[1])[:5])
        print(f"  NOTE  {path}: {len(burst)} burst-suspect quer{'y' if len(burst)==1 else 'ies'} (sample spread >3x): {worst}")
    # summary lines carry only the slowest; prefer queries_file if noted
    return (
        {k: float(v) for k, v in q.items()},
        float(ref) if isinstance(ref, (int, float)) and ref > 0 else None,
        burst,
    )


def main() -> int:
    (old, ref_old, burst_old), (new, ref_new, burst_new) = _load(sys.argv[1]), _load(sys.argv[2])
    thresh = float(sys.argv[3]) if len(sys.argv) > 3 else 1.5
    common = sorted(set(old) & set(new))
    if not common:
        print("no overlapping queries")
        return 1
    t_old, t_new = sum(old[k] for k in common), sum(new[k] for k in common)
    print(
        f"overlap: {len(common)} queries; old {t_old:.1f}s -> new {t_new:.1f}s "
        f"({t_new / t_old:.2f}x)"
    )
    if ref_old and ref_new:
        box = ref_new / ref_old
        print(
            f"box_ref_sec: old {ref_old:.2f}s -> new {ref_new:.2f}s "
            f"(box {box:.2f}x); box-normalized overlap ratio "
            f"{t_new / t_old / box:.2f}x"
        )
    elif ref_old or ref_new:
        print("box_ref_sec present in only one snapshot; raw ratios only")
    for k in common:
        if old[k] > 0.05 and new[k] == 0:
            print(f"  WARN  {k}: old {old[k]:.2f}s -> new 0.0s (missing/failed timing?)")
    flagged = [
        (new[k] / old[k], k, old[k], new[k])
        for k in common
        if old[k] > 0.05 and new[k] > 0 and (new[k] / old[k] > thresh or old[k] / new[k] > thresh)
    ]
    for r, k, o, n in sorted(flagged, reverse=True):
        norm = (
            f"  ({r / (ref_new / ref_old):.2f}x box-normalized)"
            if ref_old and ref_new
            else ""
        )
        # a mover whose sweep flagged it burst-suspect is labeled so a
        # localized contention burst doesn't read as a code regression
        tags = []
        if k in burst_old:
            tags.append(f"burst-suspect in OLD sweep ({burst_old[k]:.1f}x spread)")
        if k in burst_new:
            tags.append(f"burst-suspect in NEW sweep ({burst_new[k]:.1f}x spread)")
        tag = ("  [" + "; ".join(tags) + "]") if tags else ""
        print(f"  {r:5.2f}x  {k}: {o:.2f}s -> {n:.2f}s{norm}{tag}")
    if not flagged:
        print(f"  no per-query change beyond {thresh}x")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())

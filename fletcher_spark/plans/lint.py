"""Scale-safety plan linter.

A query that is correct at sf0.1 can still be a non-starter at 100 TB:
an accidental cartesian product, a row-at-a-time Python UDF in the hot
path, a global sort of the full corpus, or an Exchange that funnels
everything through one partition.  These are all visible in the
PHYSICAL plan before a single task runs, so they belong in a linter,
not a post-mortem.

The rules are exactly the invariants this repo's CI sweeps over its
query registry (tests/test_plans.py::test_registry_wide_plan_invariants
and friends); this module exposes them to users as a library call:

    from fletcher_spark.plans import lint_plan, assert_scale_safe
    for f in lint_plan(df):
        print(f.severity, f.rule, "—", f.detail)
    assert_scale_safe(df)        # raises on error-severity findings

Severities:

* ``error`` — never acceptable at scale (cost or transfer is
  super-linear in the input): cartesian product, row-wise Python UDF.
* ``warn``  — legitimate in bounded positions (a 1-row dimension, a
  top-k tail, a k-row model table) but a scale bug anywhere data size
  is input-proportional: broadcast nested-loop join, global sort,
  single-partition exchange, unpartitioned window.

The checks are string-level over ``executedPlan`` — deliberately: the
same representation ``df.explain()`` prints, stable across Spark 3.5/4,
and independent of private planner APIs.
"""

from __future__ import annotations

import re
from dataclasses import dataclass

from pyspark.sql import DataFrame

__all__ = [
    "PlanFinding",
    "lint_plan",
    "assert_scale_safe",
    "report",
    "unbounded_single_partition_exchanges",
]


@dataclass(frozen=True)
class PlanFinding:
    rule: str
    severity: str  # "error" | "warn"
    detail: str


def _physical_plan(df: DataFrame) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


#: (rule, severity, plan-substring regex, explanation)
_RULES: list[tuple[str, str, str, str]] = [
    (
        "cartesian-product",
        "error",
        r"CartesianProduct",
        "all-pairs product: cost is |left|×|right|; key the join "
        "(bucket/block/band keys) so it becomes an equi-join",
    ),
    (
        "row-python-udf",
        "error",
        r"BatchEvalPython",
        "row-at-a-time Python UDF: per-row interpreter crossing; use "
        "built-in expressions or an Arrow-batched pandas_udf / "
        "applyInPandas / mapInArrow",
    ),
    (
        "broadcast-nested-loop",
        "warn",
        r"BroadcastNestedLoopJoin",
        "non-equi join against a broadcast side: fine for a 1-row or "
        "k-row table (corpus-size aggregates, model literals), a scale "
        "bug if the broadcast side grows with the input",
    ),
    (
        "global-sort",
        "warn",
        r"^(?!.*TakeOrderedAndProject).*\bSort \[[^\]]*\], true,",
        "global Sort of the full input: acceptable only feeding a "
        "bounded tail (use orderBy+limit → TakeOrderedAndProject, or "
        "repartitionByRange + sortWithinPartitions for total order "
        "without a single-point funnel)",
    ),
    (
        "single-partition-exchange",
        "warn",
        r"Exchange SinglePartition",
        "everything funnels through ONE partition: correct for a "
        "global scalar aggregate or an unpartitioned window over k "
        "rows, a serialization point if the input is corpus-sized — "
        "partition the window / pre-aggregate first",
    ),
]


#: Operators that bound the row count of their output regardless of
#: input size — a single-partition Exchange above one of these funnels
#: an aggregate/limit-sized stream, not the table.  ``ReusedExchange``
#: is deliberately NOT here: it merely references another exchange,
#: which may itself be unbounded (it is resolved structurally below).
_BOUNDING_RE = re.compile(
    r"HashAggregate|ObjectHashAggregate|SortAggregate"
    r"|TakeOrderedAndProject|LocalLimit|GlobalLimit|CollectLimit"
    r"|WindowGroupLimit|Scan OneRowRelation|LocalTableScan"
)

#: Fixed-ratio bucketing: ``FLOOR(col / <numeric literal>)``.  An
#: aggregate GROUPED ON such a bucket shrinks its input by a CONSTANT
#: factor, not to a bounded cardinality — at 100× the data the
#: "summary" is 100× bigger too, so it must not count as row-bounding
#: for funnel purposes.  A column-valued divisor (e.g. a bucket size
#: derived in-plan from the key span) adapts with the data and stays
#: bounding; so does an aggregate whose keys don't include the bucket
#: (e.g. a global keys=[] summary downstream of one).
#: the no-comma/no-bracket body keeps the lazy match from spanning
#: sibling expressions in a Project/keys list (e.g. tainting an
#: unrelated ``avg((b / 7.0)) AS g`` that follows a harmless FLOOR)
_FIXED_RATIO_RE = re.compile(r"FLOOR\([^,\[\]]*? / \d+(?:\.\d+)?\)")

#: a Project line defining a fixed-ratio bucket attribute:
#: ``FLOOR((doc_id#6L / 64)) AS bk#123L`` → captures "123"
_FIXED_RATIO_DEF_RE = re.compile(
    r"FLOOR\([^,\[\]]*? / \d+(?:\.\d+)?\)\) AS \w+#(\d+)"
)

_AGG_RE = re.compile(r"HashAggregate|ObjectHashAggregate|SortAggregate")
_AGG_KEYS_RE = re.compile(r"Aggregate\(keys=\[([^\]]*)\]")


def _line_depth(line: str) -> int:
    m = re.search(r"[+:]- ", line)
    return m.start() if m else -1


def _subtree(lines: list[str], i: int) -> list[str]:
    d = _line_depth(lines[i])
    sub: list[str] = []
    for j in range(i + 1, len(lines)):
        dj = _line_depth(lines[j])
        if 0 <= dj <= d:
            break
        sub.append(lines[j])
    return sub


def unbounded_single_partition_exchanges(plan: str) -> list[str]:
    """Single-partition Exchanges whose subtree reaches a scan without
    passing any row-count-bounding operator — i.e. the whole table
    funnels through one task (the global-sort / global-lead / ntile
    funnel class).

    Two refinements over a plain "contains an aggregate" test:

    * an aggregate whose only grouping shrink is FIXED-RATIO bucketing
      (``FLOOR(col / literal)``) does not bound — the funnel input is a
      constant fraction of the table and grows linearly with it;
    * a ``ReusedExchange`` only bounds if the exchange subtree it
      reuses is itself bounded (checked against every original
      ``Exchange hashpartitioning`` subtree in the plan — conservative:
      if ANY original exchange is unbounded, the reuse doesn't bound).
    """
    lines = plan.splitlines()

    def subtree_bounded(sub: list[str]) -> bool:
        bounding = [s for s in sub if _BOUNDING_RE.search(s)]
        if not bounding:
            return False
        tainted_ids: set[str] = set()
        for s in sub:
            tainted_ids.update(_FIXED_RATIO_DEF_RE.findall(s))

        def agg_bounds(line: str) -> bool:
            m = _AGG_KEYS_RE.search(line)
            if m is None:
                return True
            keys = m.group(1)
            if not keys.strip():
                return True  # global aggregate: one row out, always bounds
            if _FIXED_RATIO_RE.search(keys):
                return False  # bucket expression inlined into the keys
            key_ids = set(re.findall(r"#(\d+)", keys))
            return not (key_ids & tainted_ids)

        return any(
            agg_bounds(s) if _AGG_RE.search(s) else True for s in bounding
        )

    originals = [
        i
        for i, l2 in enumerate(lines)
        if re.search(r"Exchange (hash|range)partitioning|Exchange SinglePartition", l2)
        and "ReusedExchange" not in l2
    ]

    flagged = []
    for i, ln in enumerate(lines):
        if "Exchange SinglePartition" not in ln or "ReusedExchange" in ln:
            continue
        sub = _subtree(lines, i)
        bounded = subtree_bounded(sub)
        if not bounded and any("ReusedExchange" in s for s in sub):
            # the reuse stands in for a bounded original only if every
            # original exchange subtree in the plan is itself bounded
            # (string plans don't carry the reuse target, so this is
            # the conservative resolution)
            bounded = bool(originals) and all(
                subtree_bounded(_subtree(lines, j)) or j == i for j in originals
            )
        if not bounded:
            flagged.append(ln.strip())
    return flagged


def lint_plan(df: DataFrame) -> list[PlanFinding]:
    """Lint a DataFrame's physical plan; returns findings, worst first.

    Rules and severities are documented on the module; an empty list
    means none of the known scale-breaking shapes appear.
    """
    plan = _physical_plan(df)
    findings: list[PlanFinding] = []
    funnels = unbounded_single_partition_exchanges(plan)
    if funnels:
        findings.append(
            PlanFinding(
                "unbounded-single-partition-funnel",
                "warn",
                "un-aggregated (or only fixed-ratio-bucketed) table rows "
                "funnel through ONE partition: " + "; ".join(funnels[:3]),
            )
        )
    for rule, severity, pattern, explain in _RULES:
        if rule == "global-sort":
            # a Sort feeding TakeOrderedAndProject never materializes a
            # global sort; flag only "Sort [...], true," plans without it
            hit = bool(
                re.search(r"\bSort \[[^\]]*\], true,", plan)
                and "TakeOrderedAndProject" not in plan
            )
        else:
            hit = bool(re.search(pattern, plan))
        if hit:
            findings.append(PlanFinding(rule, severity, explain))
    order = {"error": 0, "warn": 1}
    return sorted(findings, key=lambda f: order[f.severity])


def assert_scale_safe(df: DataFrame, allow: set[str] | frozenset[str] = frozenset()) -> None:
    """Raise ``AssertionError`` if the plan has error-severity findings.

    ``allow`` suppresses named rules for documented exceptions (e.g. a
    correctness-oracle baseline that is intentionally brute-force)."""
    bad = [f for f in lint_plan(df) if f.severity == "error" and f.rule not in allow]
    if bad:
        raise AssertionError(
            "plan is not scale-safe: "
            + "; ".join(f"[{f.rule}] {f.detail}" for f in bad)
        )


def report(df: DataFrame) -> str:
    """Human-readable lint report (empty string == clean)."""
    return "\n".join(f"{f.severity:5s} {f.rule}: {f.detail}" for f in lint_plan(df))

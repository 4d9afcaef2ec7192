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

__all__ = ["PlanFinding", "lint_plan", "assert_scale_safe", "report"]


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


def lint_plan(df: DataFrame) -> list[PlanFinding]:
    """Lint a DataFrame's physical plan; returns findings, worst first.

    Rules and severities are documented on the module; an empty list
    means none of the known scale-breaking shapes appear.
    """
    plan = _physical_plan(df)
    findings: list[PlanFinding] = []
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

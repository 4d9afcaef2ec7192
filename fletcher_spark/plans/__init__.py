"""Plan-level tooling: the scale-safety linter.

``lint_plan(df)`` inspects a DataFrame's physical plan for the shapes
that break at cluster scale (cartesian products, row-at-a-time Python,
global sorts, single-partition funnels); ``assert_scale_safe(df)``
turns the error-severity findings into an exception.  This is the
library form of the invariants tests/test_plans.py enforces over the
query registry in CI.
"""

from fletcher_spark.plans.lint import (
    PlanFinding,
    assert_scale_safe,
    lint_plan,
    report,
)

__all__ = ["PlanFinding", "lint_plan", "assert_scale_safe", "report"]

"""Physical-plan inspection: the scale contract is enforced as plan
assertions, not hope. A query whose results match the oracle but whose
plan contains a cartesian product, an un-pushed filter, or a
shuffle-join against a 5-row dim table is still a 100 TB bug.

These helpers read Spark's executed/formatted/codegen plan strings via
the same JVM entry points `df.explain()` uses, so assertions run
against exactly what would execute.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

QUADRATIC_JOINS = ("CartesianProduct", "BroadcastNestedLoopJoin")


def executed_plan(df: DataFrame) -> str:
    """The physical plan string (post-optimization, pre-AQE-replan)."""
    return df._jdf.queryExecution().executedPlan().toString()


def formatted_plan(df: DataFrame) -> str:
    """`explain("formatted")` text — includes PushedFilters/ReadSchema."""
    return df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )


def codegen_plan(df: DataFrame) -> str:
    """`explain("codegen")` text — shows WholeStageCodegen spans."""
    return df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "codegen"
    )


def assert_hash_join_only(df: DataFrame) -> str:
    """Fail if any join in the plan degrades to a quadratic strategy
    (cartesian product / broadcast nested loop). Returns the plan for
    further assertions."""
    plan = executed_plan(df)
    for bad in QUADRATIC_JOINS:
        assert bad not in plan, f"{bad} in plan:\n{plan}"
    return plan

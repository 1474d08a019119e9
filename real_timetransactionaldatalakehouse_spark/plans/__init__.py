"""Plan inspection helpers (SURVEY.md section 4): assert that the
physical plans Catalyst produces are the plans this engine is designed
around — filters pushed to the parquet scan, projections pruned,
small dims broadcast, top-k compiled to TakeOrderedAndProject,
whole-stage codegen covering the hot path.

These are the engine's performance *contracts*; tests/test_plans.py
locks them so a refactor that silently de-optimizes a plan fails CI.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def formatted_plan(df: DataFrame) -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(  # noqa: SLF001
        df._jdf.queryExecution(), "formatted"
    )


def has_pushed_filter(df: DataFrame, fragment: str) -> bool:
    """True if the parquet scan node advertises a pushed filter
    mentioning ``fragment``."""
    plan = formatted_plan(df)
    for line in plan.splitlines():
        if "PushedFilters" in line and fragment in line:
            return True
    return False


def read_schema_columns(df: DataFrame) -> list[str]:
    """Columns actually read from the scan (column pruning check)."""
    plan = formatted_plan(df)
    cols: list[str] = []
    for line in plan.splitlines():
        if "ReadSchema" in line:
            inner = line.split("struct<", 1)[-1].rsplit(">", 1)[0]
            cols.extend(f.split(":")[0].strip() for f in inner.split(",") if ":" in f)
    return cols


def uses_broadcast_join(df: DataFrame) -> bool:
    return "BroadcastHashJoin" in formatted_plan(df)


def uses_take_ordered(df: DataFrame) -> bool:
    return "TakeOrderedAndProject" in formatted_plan(df)


def has_partial_aggregation(df: DataFrame) -> bool:
    """Map-side combine before the shuffle (partial -> final hash agg)."""
    plan = formatted_plan(df)
    return plan.count("HashAggregate") >= 2 or "partial" in plan.lower()


def whole_stage_codegen_spans(df: DataFrame) -> int:
    """Distinct whole-stage-codegen spans in the (executed, if
    available) plan — shown as ``*(n)`` markers."""
    import re

    plan = df._jdf.queryExecution().executedPlan().toString()  # noqa: SLF001
    return len(set(re.findall(r"\*\((\d+)\)", plan)))


def has_cartesian_product(df: DataFrame) -> bool:
    plan = formatted_plan(df)
    return "CartesianProduct" in plan or "BroadcastNestedLoopJoin" in plan

"""Physical-plan inspection helpers.

The 100 TB design rules (README) are testable claims about plans, not
prose: filters must reach the parquet scan, small dims must broadcast,
hot paths must stay in whole-stage codegen. These helpers turn
``explain`` output into assertions so scale regressions fail in pytest
instead of in production.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def formatted_plan(df: DataFrame) -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(df._jdf.queryExecution(), "formatted")


def pushed_filters(df: DataFrame) -> list[str]:
    """PushedFilters entries across all scans in the plan."""
    out = []
    for line in formatted_plan(df).splitlines():
        line = line.strip()
        if line.startswith("PushedFilters:"):
            out.append(line.removeprefix("PushedFilters:").strip())
    return out


def read_schemas(df: DataFrame) -> list[str]:
    """ReadSchema entries — what each scan actually reads (pruning check)."""
    return [
        line.strip().removeprefix("ReadSchema:").strip()
        for line in formatted_plan(df).splitlines()
        if line.strip().startswith("ReadSchema:")
    ]


def has_broadcast_join(df: DataFrame) -> bool:
    return "BroadcastHashJoin" in formatted_plan(df) or "BroadcastNestedLoopJoin" in formatted_plan(df)


def shuffle_count(df: DataFrame) -> int:
    """Number of Exchange operators (shuffles) in the physical plan."""
    plan = formatted_plan(df)
    return sum(
        1
        for line in plan.splitlines()
        if line.strip().startswith("(")
        and ("Exchange" in line and "BroadcastExchange" not in line and "Reused" not in line)
    )


def scan_count(df: DataFrame) -> int:
    """Number of parquet scan operators in the physical plan — each one
    is a full pass over its input at scale, so single-pass shapes
    (fused subspace assignment, checkpointed multi-consumer subtrees)
    pin their scan budget like the exchange budget."""
    return sum(
        1
        for line in formatted_plan(df).splitlines()
        if line.strip().startswith("(") and "Scan parquet" in line
    )


def codegen_stages(df: DataFrame) -> int:
    plan = df._sc._jvm.PythonSQLUtils.explainString(df._jdf.queryExecution(), "codegen")
    # header: "Found N WholeStageCodegen subtrees."
    first = plan.splitlines()[0] if plan else ""
    try:
        return int(first.split()[1])
    except (IndexError, ValueError):
        return 0

"""Plan-quality helpers: assert the physical plan we designed for.

The engine's scale story rests on specific plan shapes — filters
reaching the Parquet scan, partition pruning on ``bucket``, broadcast
of query weights, no stray shuffles. These helpers let tests pin those
shapes so a regression (e.g. a cast that breaks pushdown) fails loudly
instead of silently costing 100x at 100 TB.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def formatted_plan(df: DataFrame) -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )


def assert_pushed_filter(df: DataFrame, fragment: str) -> None:
    plan = formatted_plan(df)
    assert "PushedFilters" in plan, plan
    pushed = [
        line for line in plan.splitlines() if "PushedFilters" in line
    ]
    assert any(fragment in line for line in pushed), (
        f"filter {fragment!r} not pushed to scan:\n" + "\n".join(pushed)
    )


def assert_partition_filter(df: DataFrame, fragment: str) -> None:
    plan = formatted_plan(df)
    part = [l for l in plan.splitlines() if "PartitionFilters" in l]
    assert any(fragment in line for line in part), (
        f"partition filter {fragment!r} missing:\n" + "\n".join(part) + plan
    )


def assert_no_nested_loop(df: DataFrame) -> None:
    """The O(n^2)-plan tripwire: no BroadcastNestedLoopJoin and no
    CartesianProduct anywhere in the physical plan. Every pairwise
    operator (dedup, near-dup, knn candidate generation) must be an
    equi-join on a blocking key — a nested-loop plan passes small-scale
    gates and detonates on a real corpus."""
    plan = formatted_plan(df)
    assert "BroadcastNestedLoopJoin" not in plan, plan
    assert "CartesianProduct" not in plan, plan


def assert_broadcast_join(df: DataFrame) -> None:
    plan = formatted_plan(df)
    assert "BroadcastHashJoin" in plan or "BroadcastNestedLoopJoin" in plan, plan


def count_exchanges(df: DataFrame) -> int:
    plan = formatted_plan(df)
    return sum(
        1 for line in plan.splitlines()
        if "Exchange" in line and "reuse" not in line.lower()
    )

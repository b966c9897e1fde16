"""Read scale-relevant properties off executed physical plans."""

from __future__ import annotations

import re

from pyspark.sql import DataFrame

# Python-eval operators: every one of these moves rows (Arrow-batched
# or worse) across the JVM<->Python boundary.
PY_EVAL_NODES = (
    "BatchEvalPython",
    "ArrowEvalPython",
    "FlatMapGroupsInPandas",
    "MapInPandas",
    "PythonMapInArrow",
)

JOIN_NODES = (
    "BroadcastHashJoin",
    "SortMergeJoin",
    "ShuffledHashJoin",
    "BroadcastNestedLoopJoin",
    "CartesianProduct",
)


def physical_plan(df: DataFrame) -> str:
    """The executed (pre-AQE-finalization) physical plan string."""
    return df._jdf.queryExecution().executedPlan().toString()


def count_exchanges(plan: str) -> int:
    """Shuffle exchanges in the plan (broadcast exchanges excluded —
    they ship a small table, not the data)."""
    return len(re.findall(r"\bExchange hashpartitioning|\bExchange rangepartitioning|\bExchange RoundRobinPartitioning|\bExchange SinglePartition", plan))


def has_python_eval(plan: str) -> list[str]:
    """Python-boundary operators present in the plan, if any."""
    return [n for n in PY_EVAL_NODES if n in plan]


def pushed_filters(plan: str) -> list[str]:
    """Every PushedFilters list that reached a file scan."""
    return re.findall(r"PushedFilters: \[([^\]]*)\]", plan)


def read_schemas(plan: str) -> list[str]:
    """Every ReadSchema a file scan declares (column-pruning view)."""
    return re.findall(r"ReadSchema: struct<([^>]*)>", plan)


def audit(df: DataFrame) -> dict:
    """One-line scale summary of a DataFrame's physical plan."""
    plan = physical_plan(df)
    joins = [n for n in JOIN_NODES if n in plan]
    return {
        "shuffles": count_exchanges(plan),
        "python_eval": has_python_eval(plan),
        "joins": joins,
        "pushed_filters": [f for f in pushed_filters(plan) if f],
        "read_schemas": read_schemas(plan),
        "window_group_limit": "WindowGroupLimit" in plan,
        "partial_agg": plan.count("HashAggregate") >= 2
        or "partial_" in plan
        or "Partial" in plan,
    }

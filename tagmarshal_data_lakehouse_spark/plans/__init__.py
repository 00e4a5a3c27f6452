"""Physical-plan introspection: the contracts the 100 TB design depends
on, readable from code instead of eyeballing `.explain()` output.

Used by tests/test_plan_quality.py to pin plan properties (pushdown,
broadcast, shuffle-freedom, codegen) and available interactively for
plan audits during development:

    >>> from tagmarshal_data_lakehouse_spark import plans
    >>> plans.pushed_filters(df)
    ['IsNotNull(l_shipdate)', 'LessThanOrEqual(l_shipdate,...)']
    >>> plans.count_exchanges(df)
    1
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame


def physical_plan(df: DataFrame) -> str:
    """The executed-plan tree string (pre-execution this is the initial
    adaptive plan; after an action on `df` it is the final plan)."""
    return df._jdf.queryExecution().executedPlan().toString()


def pushed_filters(df: DataFrame) -> list[str]:
    """Filters the parquet scan will evaluate row-group/page level."""
    out: list[str] = []
    for m in re.finditer(r"PushedFilters: \[([^\]]*)\]", physical_plan(df)):
        body = m.group(1).strip()
        if body:
            # split on top-level commas (filter args contain no brackets)
            out.extend(p.strip() for p in body.split(", "))
    return out


def read_schema(df: DataFrame) -> str:
    """The column set the scan actually materializes (pruning check)."""
    m = re.search(r"ReadSchema: (struct<[^\n]*)", physical_plan(df))
    return m.group(1) if m else ""


def count_exchanges(df: DataFrame) -> int:
    """Number of shuffle boundaries in the plan (0 = fully row-local)."""
    return physical_plan(df).count("Exchange hashpartitioning") + physical_plan(df).count(
        "Exchange rangepartitioning"
    )


def join_strategies(df: DataFrame) -> list[str]:
    """Join operators in plan order (BroadcastHashJoin, SortMergeJoin, ...)."""
    return re.findall(
        r"(BroadcastHashJoin|SortMergeJoin|ShuffledHashJoin|BroadcastNestedLoopJoin|CartesianProduct)",
        physical_plan(df),
    )


def codegen_fused(df: DataFrame) -> bool:
    """True when the FINAL adaptive plan contains whole-stage-codegen
    spans (the `*(n)` operator prefixes).  Requires `df` to have been
    executed — AQE finalizes the plan only on the DataFrame's own action.
    """
    plan = physical_plan(df)
    return "isFinalPlan=true" in plan and "*(" in plan

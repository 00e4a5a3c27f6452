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


def scale_lint(df: DataFrame) -> list[dict]:
    """Automated would-this-survive-100x audit of a DataFrame's physical
    plan: returns one finding per scale hazard, empty when clean.

    Checks (each encodes a contract tests/test_plan_quality.py pins
    manually for the registry's flagship queries — this is the same
    judgment as a reusable linter for NEW plans):

    - ``cartesian``: a CartesianProduct operator — O(n·m) row explosion;
    - ``nested_loop_join``: BroadcastNestedLoopJoin over a NON-trivial
      build side (a one-row broadcast, e.g. an audit-scalar cross join,
      is exempt — the pattern several operators use deliberately);
    - ``single_partition_window``: a window/sort over ONE partition
      (``Window`` with an empty partitionBy shows as
      ``windowspecdefinition(...)`` with no partition keys after an
      Exchange SinglePartition) — the whole input funnels through one
      task;
    - ``scan_no_pruning``: a parquet scan materializing every column of
      a wide schema (>24 columns) with no pushed filters — usually a
      missing projection/filter, always worth a look;
    - ``python_row_udf``: BatchEvalPython (row-at-a-time Python UDF) in
      the plan — 10-100x slower than Arrow/builtin paths.

    Heuristics read the plan STRING — same substrate as the contract
    tests, stable across Spark 3.5/4.x plan renderings used here.
    """
    plan = physical_plan(df)
    findings: list[dict] = []

    if "CartesianProduct" in plan:
        findings.append(
            {"rule": "cartesian", "detail": "CartesianProduct operator in plan"}
        )

    # BNLJ: exempt the one-row-broadcast idiom (audit scalars). A trivial
    # build side shows as a broadcast of a plan subtree containing a
    # global ("functions=[...]," with no keys) HashAggregate right under
    # the BroadcastExchange feeding the BNLJ; cheap proxy: if every BNLJ
    # in the plan is a Cross/Inner with IdentityBroadcastMode over an
    # aggregate, skip — else flag.
    n_bnlj = plan.count("BroadcastNestedLoopJoin")
    if n_bnlj:
        n_scalar_builds = len(
            re.findall(
                r"BroadcastExchange IdentityBroadcastMode[^\n]*\n[^\n]*HashAggregate",
                plan,
            )
        )
        if n_bnlj > n_scalar_builds:
            findings.append(
                {
                    "rule": "nested_loop_join",
                    "detail": f"{n_bnlj} BroadcastNestedLoopJoin(s), "
                    f"{n_scalar_builds} recognizably one-row builds",
                }
            )

    # Single-partition exchange DIRECTLY feeding a window: the whole
    # input funnels through one task. Two exemptions: (a) adjacency —
    # a SinglePartition elsewhere in the plan (global scalar subquery
    # aggregate) is unrelated to a window/sort elsewhere; (b) an
    # aggregate between the window and the exchange bounds the frame
    # (windowing daily totals or 256 bucket offsets, not the corpus).
    lines = plan.splitlines()
    flagged = False
    for i, line in enumerate(lines):
        if flagged or not re.search(r"\bWindow(GroupLimit)? \[", line):
            continue
        for j in range(i + 1, min(i + 6, len(lines))):
            if "Scan" in lines[j] or "HashAggregate" in lines[j]:
                break  # data/aggregate reached before any single-partition exchange
            if "Exchange SinglePartition" in lines[j]:
                # bounded if the exchange's own input is an aggregate
                # (windowing daily totals / bucket offsets, not the corpus)
                below = []
                for s in lines[j + 1 : j + 8]:
                    below.append(s)
                    if "Scan" in s or "Range (" in s:
                        break
                if not any("HashAggregate" in s for s in below):
                    findings.append(
                        {
                            "rule": "single_partition_window",
                            "detail": "Exchange SinglePartition directly feeds a Window over unaggregated input",
                        }
                    )
                    flagged = True
                break

    for m in re.finditer(r"ReadSchema: struct<([^\n]*)", plan):
        cols = m.group(1).count(":")
        scan_region = plan[max(0, m.start() - 800): m.start()]
        if cols > 24 and "PushedFilters: [" in scan_region and not re.search(
            r"PushedFilters: \[[^\]]+\]", scan_region
        ):
            findings.append(
                {
                    "rule": "scan_no_pruning",
                    "detail": f"scan reads {cols} columns with no pushed filters",
                }
            )

    if "BatchEvalPython" in plan:
        findings.append(
            {
                "rule": "python_row_udf",
                "detail": "row-at-a-time Python UDF (BatchEvalPython) in plan",
            }
        )

    return findings

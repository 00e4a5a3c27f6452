"""Driver-sim verification for staged (not-yet-registered) telemetry
bridge entries.

The dashboard-library rotation (VERDICT r7 item 6) lands a few driver
rows per round; entries built ahead of their promotion round sit in
`telemetry_bridge.R{N}_STAGED` blocks because a never-green
oracle-backed entry must occupy a sweep-head slot the round it is
registered (tests/test_registry_order.py) and the near-term heads are
full.  This module holds every staged-and-unregistered entry to the
driver's exact standard in the meantime: the same build(spark, sf_dir)
vs DuckDB-oracle compare the correctness driver runs.

Promotion checklist per block (the R8_STAGED playbook that worked for
the gold models): append the block to QUERIES, slot the names into the
sweep head, record the oracle texts in the ledger
(tools/update_query_text_hashes.py --round N).  A block that has been
promoted drops out of the parametrization below automatically (its
names appear in the registry), so no test edit is needed at promotion
time; every promoted name listed in _TS_STAGED below (the
_dates_as_ntz users) must simultaneously move into
test_tz_independence.TS_QUERIES — promotion removes it from the staged
single-zone check here, and only the TS_QUERIES move keeps (and
widens) its timezone coverage.
"""

from __future__ import annotations

import os

import pytest

from tagmarshal_data_lakehouse_spark.queries import registry
from tagmarshal_data_lakehouse_spark.queries import telemetry_bridge as tb

from .oracle_harness import run_query_pair

_TESTDATA = os.environ.get("SPARK_GRAFT_TESTDATA", "/root/testdata")
SF_DIR = os.environ.get("STAGED_SF_DIR", f"{_TESTDATA}/sf0.001")

_REGISTERED = set(registry())

# Every R{N}_STAGED block (lexicographic attribute order — fine, names
# are unique and ordering only affects test ids); entries already
# promoted to the registry are excluded (their driver rows are the real
# check now).
_BLOCKS = {
    a: list(getattr(tb, a))
    for a in sorted(a for a in dir(tb) if a.endswith("_STAGED") and a[0] == "R")
}
STAGED = [q for qs in _BLOCKS.values() for q in qs if q.name not in _REGISTERED]


@pytest.mark.parametrize("q", STAGED, ids=lambda q: q.name)
def test_staged_entry_matches_driver_oracle(spark, q):
    problems = run_query_pair(spark, q, SF_DIR, require_rows=True)
    assert not problems, f"{q.name}: {problems[:3]}"


def test_staged_blocks_promote_whole_or_not_at_all():
    """Pre-promotion guard: registering a never-green oracle-backed
    entry mid-round would violate the rotation gate's head-capacity
    arithmetic — a staged block is promoted at a round boundary as a
    UNIT (the registry append + sweep-head slots together), never
    piecemeal.  A partially-registered block is therefore always a
    mistake: the registered names sit outside the sweep head while
    their block-mates silently keep running only the staged check."""
    partial = {
        a: sorted(q.name for q in qs if q.name in _REGISTERED)
        for a, qs in _BLOCKS.items()
        if 0 < sum(q.name in _REGISTERED for q in qs) < len(qs)
    }
    assert not partial, f"staged blocks partially registered: {partial}"


def test_staged_entries_have_unique_names_and_oracles():
    names = [q.name for q in STAGED]
    assert len(names) == len(set(names))
    assert all(q.oracle for q in STAGED)


def test_staged_parity_inherits_the_dtype_class_check():
    """VERDICT r9 item 6, made explicit: "staged green means driver
    green" holds only because every staged entry above runs through
    run_query_pair -> compare(), whose transport-dtype-CLASS check
    (oracle_harness._dtype_class, added r9 after the r08
    telemetry_hole_duration red) is what the driver's typed value-hash
    actually distinguishes. Pin BOTH halves: (a) the harness this
    module calls is the class-checking compare — an int64 column vs a
    value-equal float64 column must red; (b) run_query_pair routes its
    frames through that same compare (so a future refactor cannot
    silently give staged entries a weaker check than promoted ones)."""
    import inspect

    import pandas as pd

    from . import oracle_harness

    a = pd.DataFrame({"x": pd.Series([1, 2], dtype="int64")})
    b = pd.DataFrame({"x": pd.Series([1.0, 2.0], dtype="float64")})
    problems = oracle_harness.compare(a, b)
    assert any("transport dtype class" in p for p in problems), (
        "compare() no longer flags int-vs-float class divergence — "
        "staged green would not imply driver green"
    )
    src = inspect.getsource(oracle_harness.run_query_pair)
    assert "compare(" in src, (
        "run_query_pair no longer routes through compare() — the staged "
        "suite's parity check lost the dtype-class guarantee"
    )


# Timestamp-emitting staged entries, pre-verified under the tz gate's
# nastiest zone BEFORE promotion (the R8_STAGED precedent) — at
# promotion these names move into test_tz_independence.TS_QUERIES and
# get the full three-zone sweep.  America/Asuncion: midnight DST gap
# inside the TPC-H date range, the zone where a DATE-via-LTZ detour is
# not the identity.
_TS_STAGED = [
    "telemetry_overview_stats",
    "telemetry_events_per_course",
    "telemetry_course_summary",
    "telemetry_infrastructure_stats",
    "telemetry_expl_dataset_variance",
    "telemetry_ex_events_by_date",
    "telemetry_missing_ts_sample",
    # month_start derives from round_start_ts via DATE_TRUNC('month') —
    # the tz-sensitive surface gold_rounds_by_month guards in TS_QUERIES
    "telemetry_demo_seasonality_months",
    "telemetry_demo_top3_months",
    "telemetry_demo_bottom3_months",
    "telemetry_round_sample",
    "telemetry_course_summary_with_profile",
    "telemetry_round_duration_details",
    # R17 (engine extension, not a telemetry text): emits NTZ
    # window_start stamps derived by field arithmetic — the surface the
    # tz gate exists for.
    "events_hopping_window",
]


def test_ts_staged_names_are_live_or_promoted_into_ts_queries():
    """_TS_STAGED is hand-maintained; a typo'd name (or a promoted name
    not moved into test_tz_independence.TS_QUERIES per the checklist)
    would silently drop out of the parametrization below with ZERO tz
    coverage. Every name must therefore be either a currently-staged
    entry (single-zone check here) or present in TS_QUERIES (full
    three-zone sweep after promotion) — anything else fails loudly."""
    from .test_tz_independence import TS_QUERIES

    staged_names = {q.name for q in STAGED}
    orphans = [
        n for n in _TS_STAGED if n not in staged_names and n not in TS_QUERIES
    ]
    assert not orphans, (
        f"_TS_STAGED names with no tz coverage anywhere: {orphans} — "
        "stale/misspelled, or promoted without the TS_QUERIES move"
    )


@pytest.mark.parametrize(
    "q", [q for q in STAGED if q.name in _TS_STAGED], ids=lambda q: q.name
)
def test_staged_ts_entry_tz_independent(spark, q):
    original = spark.conf.get("spark.sql.session.timeZone")
    spark.conf.set("spark.sql.session.timeZone", "America/Asuncion")
    try:
        problems = run_query_pair(spark, q, SF_DIR, require_rows=True)
    finally:
        spark.conf.set("spark.sql.session.timeZone", original)
    assert not problems, f"{q.name} under America/Asuncion: {problems[:3]}"

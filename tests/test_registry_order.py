"""Registry-order contract.

The driver's correctness sweep walks ``registry()`` in insertion order
under a budget (round 2 stopped at exactly 50 entries), so ordering is a
coverage guarantee: a truncated sweep must still touch every query
family, and the training/LLM-pipeline surface must fit entirely inside
the historical 50-entry budget.
"""

from __future__ import annotations

from tagmarshal_data_lakehouse_spark.queries import registry

SWEEP_BUDGET = 50


def _family(name: str) -> str:
    if name.startswith("events_"):
        return "events"
    if name.startswith(("doc_", "emb_", "multimodal_")):
        return "training"
    if name.startswith("tpch_"):
        return "tpch"
    return "relational"


def test_first_twelve_interleave_every_family():
    names = list(registry())
    # Every 4-slot stripe of the flagship block holds one query per family,
    # so even a sweep budget of 4 yields a row for each family.
    for stripe_start in (0, 4, 8):
        stripe = names[stripe_start : stripe_start + 4]
        assert {_family(n) for n in stripe} == {
            "events",
            "training",
            "tpch",
            "relational",
        }, stripe


def test_sweep_budget_covers_events_and_training_completely():
    names = list(registry())
    head = names[:SWEEP_BUDGET]
    all_events = [n for n in names if _family(n) == "events"]
    all_training = [n for n in names if _family(n) == "training"]
    assert set(all_events) <= set(head)
    assert set(all_training) <= set(head)
    # The head still carries tpch + relational representatives. With
    # events+training fully inside the 50-slot window (the families the
    # round-2 sweep starved), only the flagship stripe slots remain for
    # the other two — the deliberate trade: tpch/relational get
    # representatives, not full coverage, until the budget grows.
    assert sum(_family(n) == "tpch" for n in head) >= 3
    assert sum(_family(n) == "relational" for n in head) >= 3


def test_registry_complete_and_unique():
    names = list(registry())
    assert len(names) == len(set(names))
    assert len(names) >= 104

"""Unit pins for tools/rotation.py — the due-queue arithmetic shared by
the rotation gate (tests/test_registry_order.py) and the proposal tool
(tools/rotate_head.py).

The gate exercises this module against the LIVE registry/artifacts;
these tests pin the arithmetic itself on synthetic inputs, so a future
edit that changes horizon/ordering/edited semantics fails here with a
readable fixture instead of as an opaque live-head red.
"""

from __future__ import annotations

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from tools.rotation import DueQueue, due_queue, edited_since_green, stale_horizon


def _sha(text: str) -> str:
    return f"sha:{text}"


def test_horizon_is_ceil_of_rotating_population_over_slots():
    # 218 oracle-backed, 12 flagships, 38 slots -> ceil(206/38) = 6
    assert stale_horizon(218, 12, 38) == 6
    # exactly divisible
    assert stale_horizon(50, 12, 38) == 1
    # one past a boundary bumps the period
    assert stale_horizon(51, 12, 38) == 2
    # degenerate registries never go below 1
    assert stale_horizon(5, 12, 38) == 1


def test_edited_set_covers_all_three_classes():
    texts = {"a": "t1", "b": "t2", "c": "t3", "d": "t4"}
    latest = {"a": 5, "b": 5, "c": 5}  # d never green
    ledger = {
        "a": {"sha": _sha("t1"), "round": 5},  # current, verified
        "b": {"sha": _sha("OLD"), "round": 5},  # un-recorded edit
        "c": {"sha": _sha("t3"), "round": 7},  # recorded, awaiting driver row
        # d missing entirely
    }
    edited = edited_since_green(texts, latest, ledger, _sha)
    assert edited == {"b", "c", "d"}
    # the hand list for builder-only edits unions in
    assert "a" in edited_since_green(texts, latest, ledger, _sha, frozenset({"a"}))


def test_due_queue_hard_soft_split_and_ordering():
    # 5 entries + 1 flagship; slots=2 -> horizon ceil(5/2)=3; current=10
    # => stale threshold: latest <= 7
    texts = {
        "flag": "tf",
        "fresh": "t0",      # latest 9: not due
        "stale_old": "t1",  # latest 5: due (soft), oldest
        "stale_new": "t2",  # latest 7: due (soft)
        "never": "t3",      # latest 0: hard
        "edited": "t4",     # latest 9 but text edited: hard
    }
    latest = {"flag": 9, "fresh": 9, "stale_old": 5, "stale_new": 7, "edited": 9}
    ledger = {n: {"sha": _sha(t), "round": 1} for n, t in texts.items()}
    ledger["edited"]["sha"] = _sha("CHANGED")
    dq = due_queue(texts, latest, ledger, _sha, 10, ("flag",), 2)
    assert isinstance(dq, DueQueue)
    assert dq.horizon == 3
    assert set(dq.hard) == {"never", "edited"}
    assert set(dq.soft) == {"stale_old", "stale_new"}
    # due is oldest-green first: never (0) < stale_old (5) < stale_new (7)
    # < edited (9); flagships are excluded even when stale
    assert dq.due == ("never", "stale_old", "stale_new", "edited")
    assert "flag" not in dq.due and "fresh" not in dq.due


def test_due_queue_is_stable_on_input_order_within_a_vintage():
    texts = {f"q{i}": f"t{i}" for i in range(6)}
    latest = {n: 1 for n in texts}  # all same vintage, all stale
    ledger = {n: {"sha": _sha(t), "round": 1} for n, t in texts.items()}
    dq = due_queue(texts, latest, ledger, _sha, 10, (), 3)
    assert dq.due == tuple(texts)  # insertion order preserved


def test_hand_edited_list_is_shared_by_gate_and_tool():
    """The builder-edit hand list must have exactly one home
    (rotation.EDITED_SINCE_GREEN): the gate binds it by reference and
    the rotate_head proposal tool passes it into due_queue — a name
    recorded on only one side would let the tool print a head the gate
    rejects (review r10)."""
    import inspect

    from tools import rotation, rotate_head

    from . import test_registry_order as gate

    assert gate._EDITED_SINCE_GREEN is rotation.EDITED_SINCE_GREEN
    src = inspect.getsource(rotate_head.main)
    assert "extra_edited=rotation.EDITED_SINCE_GREEN" in src, (
        "rotate_head no longer passes the shared hand list into "
        "due_queue — the gate and the tool can drift again"
    )

"""Shared due-queue arithmetic for the sweep-head rotation.

tests/test_registry_order.py (the authoritative gate) and
tools/rotate_head.py (the read-only proposal tool) must agree on what
is due each round; two hand-kept copies of the horizon / edited-since-
green / hard-vs-soft ordering can silently drift and produce proposals
the gate rejects (ADVICE r9). Both now import THIS module — the gate
VERIFIES the committed head against it, the tool PRINTS a proposal
from it, and a drift is structurally impossible.

Inputs are plain data (a name->oracle-text mapping, the artifact-
derived latest-green map, the text-hash ledger), so the module has no
Spark or registry import of its own and stays importable from both a
pytest collection and a bare CLI.
"""

from __future__ import annotations

import json
import math
import re
from dataclasses import dataclass
from pathlib import Path


@dataclass(frozen=True)
class DueQueue:
    """One round's must-verify queue, fully ordered."""

    horizon: int
    edited: frozenset[str]
    due: tuple[str, ...]  # oldest-green first, stable on input order
    hard: tuple[str, ...]  # never-green or edited — must ALL be in the head
    soft: tuple[str, ...]  # stale (green <= current - horizon)


def latest_green(repo: Path) -> dict[str, int]:
    """Each query's newest driver hash-green round, scanned from the
    committed CORRECTNESS_r*.json artifacts."""
    latest: dict[str, int] = {}
    for p in repo.glob("CORRECTNESS_r*.json"):
        m = re.search(r"_r(\d+)\.json$", p.name)
        if not m:
            continue
        r = int(m.group(1))
        for name, row in json.loads(p.read_text()).items():
            if row.get("hash_match"):
                latest[name] = max(latest.get(name, 0), r)
    return latest


def max_artifact_round(repo: Path) -> int:
    rounds = [0]
    for p in repo.glob("CORRECTNESS_r*.json"):
        m = re.search(r"_r(\d+)\.json$", p.name)
        if m:
            rounds.append(int(m.group(1)))
    return max(rounds)


def stale_horizon(n_oracle_backed: int, n_flagship: int, slots: int) -> int:
    """ceil((oracle-backed - always-swept flagships) / priority slots):
    the tightest refresh period the budget arithmetic permits. Derived,
    not hand-written, so registry growth adjusts it automatically."""
    return max(1, math.ceil((n_oracle_backed - n_flagship) / slots))


def edited_since_green(
    oracle_texts: dict[str, str],
    latest: dict[str, int],
    ledger: dict[str, dict],
    sha_fn,
    extra: frozenset[str] = frozenset(),
) -> set[str]:
    """Ledger-derived edited set: oracle text unrecorded/changed, or
    recorded for a round no driver row has confirmed yet — plus the
    hand list for builder-only edits."""
    edited = set(extra)
    for name, text in oracle_texts.items():
        rec = ledger.get(name)
        if rec is None or rec["sha"] != sha_fn(text):
            edited.add(name)  # un-recorded edit
        elif rec["round"] > latest.get(name, 0):
            edited.add(name)  # recorded edit awaiting a driver row
    return edited


# Builder-side-only edits after a green row (Spark code paths whose
# ORACLE text is unchanged — the text ledger cannot see those, and a
# result-changing builder edit is caught red by the driver hash anyway).
# Lives HERE, not in the gate, so the gate (tests/test_registry_order)
# and the proposal tool (tools/rotate_head) read the SAME hand list —
# a name recorded only on one side would let the tool print a head the
# gate rejects (review r10).
EDITED_SINCE_GREEN: frozenset[str] = frozenset()


def due_queue(
    oracle_texts: dict[str, str],
    latest: dict[str, int],
    ledger: dict[str, dict],
    sha_fn,
    current: int,
    flagships: tuple[str, ...],
    slots: int,
    extra_edited: frozenset[str] = frozenset(),
) -> DueQueue:
    """The ordered must-verify queue for `current`: never-green and
    edited entries (hard) plus entries green longer than the derived
    horizon ago (soft), sorted oldest-green first — stable on the
    input mapping's insertion order, which both callers feed in
    registry order."""
    horizon = stale_horizon(len(oracle_texts), len(flagships), slots)
    edited = edited_since_green(oracle_texts, latest, ledger, sha_fn, extra_edited)
    flag = set(flagships)
    due = [
        n
        for n in oracle_texts
        if n not in flag
        and (latest.get(n, 0) == 0 or n in edited or latest[n] <= current - horizon)
    ]
    due.sort(key=lambda n: latest.get(n, 0))  # stable: input order within a vintage
    hard = tuple(n for n in due if latest.get(n, 0) == 0 or n in edited)
    hard_set = set(hard)
    soft = tuple(n for n in due if n not in hard_set)
    return DueQueue(
        horizon=horizon,
        edited=frozenset(edited),
        due=tuple(due),
        hard=hard,
        soft=soft,
    )

"""Propose the next round's sweep head (_SWEEP_PRIORITY / _STALE_TAIL).

The rotation gate (tests/test_registry_order.py) VERIFIES the head
against the artifact-derived due queue; this tool COMPUTES that queue
with the same arithmetic and prints ready-to-paste tuples, so a round
boundary is one command instead of a hand-derivation:

    python tools/rotate_head.py --round 10 [--promote R13_STAGED R14_STAGED]

- never-green and ledger-edited entries (hard dues) fill the head first
  — the gate requires every one of them inside the sweep window;
- stale entries (driver-green longer than the derived horizon ago)
  fill the remaining priority slots oldest-first;
- whatever the queue cannot fit is printed as the tail front (the gate
  bounds it at one round of lag);
- --promote simulates registering staged bridge blocks (their entries
  become hard dues) WITHOUT editing anything — the tool is read-only;
  the mechanical checklist for actually promoting stays in
  queries/telemetry_bridge.py and the staged-pipeline notes.

The output is a PROPOSAL: paste it into queries/__init__.py, bump
HEAD_DESIGNED_FOR_ROUND, run the ledger tool if texts changed, and let
the gate confirm.
"""

from __future__ import annotations

import argparse
import json
import sys
from pathlib import Path

_REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(_REPO))


def main() -> None:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--round", type=int, required=True, dest="round_")
    ap.add_argument(
        "--promote",
        nargs="*",
        default=[],
        help="R{N}_STAGED block names to simulate registering",
    )
    args = ap.parse_args()

    from tagmarshal_data_lakehouse_spark.queries import (
        _FLAGSHIP_INTERLEAVE,
        registry,
    )
    from tagmarshal_data_lakehouse_spark.queries import telemetry_bridge as tb
    from tools import rotation
    from tools.update_query_text_hashes import oracle_sha

    reg = dict(registry())
    for block_name in args.promote:
        for q in getattr(tb, block_name):
            reg.setdefault(q.name, q)

    # The SAME arithmetic the gate runs (tools/rotation.py — ADVICE r9:
    # two copies could drift); only the presentation lives here.
    oracle_texts = {n: q.oracle for n, q in reg.items() if q.oracle is not None}
    latest = rotation.latest_green(_REPO)
    ledger = json.loads((_REPO / "QUERY_TEXT_HASHES.json").read_text())
    slots = 50 - len(_FLAGSHIP_INTERLEAVE)
    dq = rotation.due_queue(
        oracle_texts, latest, ledger, oracle_sha, args.round_,
        _FLAGSHIP_INTERLEAVE, slots,
        extra_edited=rotation.EDITED_SINCE_GREEN,
    )
    hard, soft, due = list(dq.hard), list(dq.soft), list(dq.due)

    print(f"# round {args.round_}: {len(oracle_texts)} oracle-backed, "
          f"horizon {dq.horizon} (stale = green <= r{args.round_ - dq.horizon:02d})")
    print(f"# due {len(due)} = {len(hard)} hard (never-green/edited) + {len(soft)} stale")
    if len(hard) > slots:
        print(f"# WARNING: hard dues ({len(hard)}) exceed the {slots} priority "
              "slots — the gate will red; promote fewer blocks")
    head = (hard + soft)[:slots]
    overflow = [n for n in due if n not in set(head)]
    print(f"# head fills {len(head)}/{slots} slots; overflow {len(overflow)} "
          f"({'OK' if len(overflow) <= slots else 'EXCEEDS one-round lag — the gate will red'})")
    print("\n_SWEEP_PRIORITY = (")
    for n in head:
        tag = "never-green/edited" if n in set(hard) else f"green r{latest.get(n, 0):02d}"
        print(f'    "{n}",  # {tag}')
    print(")")
    print("\n# tail front (overflow — MUST lead _STALE_TAIL):")
    for n in overflow:
        print(f'    "{n}",  # green r{latest.get(n, 0):02d}')


if __name__ == "__main__":
    main()

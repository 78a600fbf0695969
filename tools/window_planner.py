"""Driver-window staleness planner: make the per-round DRIVER_WINDOW
re-composition mechanical.

The r8 and r9 verdicts both flagged the same process failure: the window
list in plans/queries.py went un-rotated while the stale band grew.  This
tool computes, from the repo's CORRECTNESS_r*.json records, each query's
LAST GREEN DRIVER ROUND, prints the staleness histogram, and proposes the
next window under the standing policy:

1. queries never driver-checked (new registrations) — always in;
2. queries whose operators changed this round (pass names via --changed);
3. the stalest green rows, oldest round first (name tiebreak), filling
   the remaining slots.

Usage:
    python tools/window_planner.py [--slots 50] [--changed q14_x,q35_y]

Prints the histogram, the proposed 50-name list as a ready-to-paste
Python literal, and the names deferred to the round after.  It does NOT
edit queries.py — the composition is reviewed, pasted, and stamped
(bump DRIVER_WINDOW_ROUND) by hand, which is the point: the stamp only
moves when a human-readable diff shows the rotation actually happened.
"""

from __future__ import annotations

import argparse
import glob
import json
import os
import re
import sys

HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, HERE)


def last_green() -> dict[str, int]:
    last: dict[str, int] = {}
    for f in sorted(glob.glob(os.path.join(HERE, "CORRECTNESS_r*.json"))):
        rnd = int(re.search(r"r(\d+)", os.path.basename(f)).group(1))
        try:
            rec = json.load(open(f))
        except Exception:
            continue
        for q, v in rec.items():
            if not isinstance(v, dict) or v.get("err"):
                continue
            if v.get("hash_match") or (v.get("rows_match") and "hash_match" not in v):
                last[q] = rnd
    return last


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--slots", type=int, default=50)
    ap.add_argument(
        "--changed",
        default="",
        help="comma-separated query names whose code changed this round",
    )
    args = ap.parse_args()

    from re_data_pipeline_spark.plans.queries import QUERIES

    green = last_green()
    never = [q for q in QUERIES if q not in green]
    changed = [q for q in args.changed.split(",") if q.strip()]
    unknown = [q for q in changed if q not in QUERIES]
    if unknown:
        print(f"--changed names not registered: {unknown}", file=sys.stderr)
        return 1

    hist: dict[int, int] = {}
    for q, r in green.items():
        hist[r] = hist.get(r, 0) + 1
    print("last-green histogram (round -> queries):",
          dict(sorted(hist.items())))
    if never:
        print(f"never driver-checked ({len(never)}): {', '.join(sorted(never))}")

    # overflow policy (r13 fix): policy #1 is "new registrations — always
    # in", so the changed list is truncated BEFORE any never-checked name
    # is dropped (the old single [:slots] cut silently dropped
    # never-checked names while warning about the changed list)
    window: list[str] = sorted(never)
    extra_changed = [q for q in changed if q not in window]
    if len(window) > args.slots:
        print(
            f"WARNING: {len(window)} never-driver-checked queries alone "
            f"exceed {args.slots} slots — dropping "
            f"{window[args.slots:]} from the window (they ship UNCHECKED; "
            "raise --slots or split across rounds)",
            file=sys.stderr,
        )
        window = window[: args.slots]
    room_c = args.slots - len(window)
    if len(extra_changed) > room_c:
        print(
            f"WARNING: truncating the changed list — deferred to next "
            f"round: {extra_changed[room_c:]}",
            file=sys.stderr,
        )
    window += extra_changed[:room_c]
    stale = sorted(
        (q for q in green if q not in window), key=lambda q: (green[q], q)
    )
    room = args.slots - len(window)
    window += stale[:room]

    cut = green[stale[room - 1]] if room and room <= len(stale) else None
    print(f"\nproposed window ({len(window)} slots"
          + (f"; stale cut-off: round {cut}" if cut else "") + "):")
    print("DRIVER_WINDOW: list[str] = [")
    for q in window:
        print(f'    "{q}",')
    print("]")
    deferred = stale[room : room + 40]
    if deferred:
        print(f"\nnext-round candidates (stalest {len(deferred)} deferred): "
              + ", ".join(deferred))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())

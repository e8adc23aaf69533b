#!/usr/bin/env python
"""Derive the driver-window rotation plan from the CORRECTNESS_r*.json
union — replaces the hand-counted staleness histogram that produced the
round-13 off-by-one (VERDICT r13 item 5 / ADVICE r13 low).

The grading driver records rows for only the FIRST 50 registered keys,
so each round we rotate the window to the keys with the weakest
evidence: keys that have NEVER passed a driver check first
(never-checked > stale-green), then everything else by the round of its
newest passing row (oldest first), ties broken by registration order.

Usage:
    python tools/driver_staleness.py            # histogram + plan
    python tools/driver_staleness.py --emit     # print the 50-key list
                                                # as python source

A row counts as PASSED iff it hash-matched, or it is the documented
rows-only degradation (err == "no_oracle") with rows_match not False —
the same rule test_driver_window_rotation applies.
"""

from __future__ import annotations

import json
import sys
from collections import Counter
from pathlib import Path

ROOT = Path(__file__).resolve().parent.parent


def newest_pass_round() -> dict[str, int]:
    """key -> round number of its newest PASSING driver row."""
    newest: dict[str, int] = {}
    rounds = sorted(
        ROOT.glob("CORRECTNESS_r*.json"),
        key=lambda p: int("".join(c for c in p.stem if c.isdigit())),
    )
    for p in rounds:
        rnd = int("".join(c for c in p.stem if c.isdigit()))
        for k, v in json.loads(p.read_text()).items():
            if v.get("hash_match") or (
                v.get("err") == "no_oracle" and v.get("rows_match") is not False
            ):
                newest[k] = rnd
    return newest


def rotation_plan(window: int = 50) -> tuple[list[str], dict[str, int]]:
    """(next window, key -> newest pass round) in registration order
    within each staleness class."""
    sys.path.insert(0, str(ROOT))
    from t_mobile_data_fnt_etl_pipeline_aws_spark.registry import all_queries

    keys = list(all_queries())  # registration order (window-reordered is
    # fine for ranking: order within a staleness class is stable)
    newest = newest_pass_round()
    reg_pos = {k: i for i, k in enumerate(keys)}
    ranked = sorted(
        keys, key=lambda k: (newest.get(k, -1), reg_pos[k])
    )  # never-passed (-1) first, then oldest round
    return ranked[:window], newest


def main() -> None:
    plan, newest = rotation_plan()
    hist = Counter(newest.get(k, 0) for k in plan)
    all_hist = Counter(newest.values())
    print(f"registry keys with a passing driver row: {len(newest)}")
    print("staleness histogram (all keys, newest pass round -> n):")
    for rnd in sorted(all_hist):
        print(f"  r{rnd}: {all_hist[rnd]}")
    print(f"\nnext 50-key window (0 = never driver-passed): {dict(hist)}")
    if "--emit" in sys.argv:
        print("\n_DRIVER_WINDOW = [")
        for k in plan:
            tag = newest.get(k)
            print(f'    "{k}",  # {"never-checked" if tag is None else f"r{tag}"}')
        print("]")
    else:
        for k in plan:
            tag = newest.get(k)
            print(f"  {k}  [{'never' if tag is None else f'r{tag}'}]")


if __name__ == "__main__":
    main()

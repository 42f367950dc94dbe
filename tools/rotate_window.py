"""Mechanical driver-window rotation (r15, verdict #2).

The contract (``__spark_entry__._all_queries()``) is ~3× the driver's
50-entry correctness window, so entries age structurally. This tool makes
the rotation a computation instead of a hand-pick: last driver-green
round per entry is read from the committed ``CORRECTNESS_r*.json``
artifacts, and the next window is the 50 entries with the OLDEST
last-green (never-checked entries sort first), tie-broken by contract
order so the output is deterministic.

Usage:
    python tools/rotate_window.py            # print the next window
    python tools/rotate_window.py --as-of 14 # ignore artifacts > r14
    python tools/rotate_window.py --ages     # print the age histogram

``tests/test_contract.py`` pins DRIVER_WINDOW == compute_window(as_of=N)
for the round the window was authored against, so a hand-edited window
that drifts from the mechanism fails fast.
"""

from __future__ import annotations

import argparse
import glob
import json
import os
import re
import sys
from typing import Dict, List, Optional

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
WINDOW_SIZE = 50


def entry_passed(v) -> bool:
    """One CORRECTNESS_r*.json record → did the driver call it green?
    Rows+schema+hash all true and no error; rows-only records (no hash
    key) count on rows_match alone, matching the driver's weaker check."""
    if not isinstance(v, dict):
        return bool(v)
    if v.get("err"):
        return False
    return (
        bool(v.get("rows_match"))
        and bool(v.get("schema_match", True))
        and bool(v.get("hash_match", v.get("rows_match")))
    )


def last_green(as_of: Optional[int] = None,
               repo: str = REPO) -> Dict[str, int]:
    """name → last round whose driver artifact recorded it green
    (0 = never driver-checked)."""
    out: Dict[str, int] = {}
    for f in sorted(glob.glob(os.path.join(repo, "CORRECTNESS_r*.json"))):
        m = re.search(r"r(\d+)\.json$", f)
        if not m:
            continue
        r = int(m.group(1))
        if as_of is not None and r > as_of:
            continue
        with open(f) as fh:
            d = json.load(fh)
        for name, v in d.items():
            if entry_passed(v):
                out[name] = max(out.get(name, 0), r)
    return out


def contract_names() -> List[str]:
    sys.path.insert(0, REPO)
    import importlib.util

    spec = importlib.util.spec_from_file_location(
        "entry", os.path.join(REPO, "__spark_entry__.py"))
    entry = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(entry)
    return list(entry._all_queries().keys())


def compute_window(names: List[str], green: Dict[str, int],
                   size: int = WINDOW_SIZE) -> List[str]:
    """The next window: oldest last-green first (never = 0 sorts ahead
    of everything), stable on contract order within a round."""
    order = {n: i for i, n in enumerate(names)}
    ranked = sorted(names, key=lambda n: (green.get(n, 0), order[n]))
    return ranked[:size]


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--as-of", type=int, default=None,
                    help="ignore CORRECTNESS artifacts newer than this round")
    ap.add_argument("--ages", action="store_true",
                    help="print the last-green histogram instead")
    args = ap.parse_args()

    names = contract_names()
    green = last_green(as_of=args.as_of)
    if args.ages:
        from collections import Counter

        hist = Counter(green.get(n, 0) for n in names)
        for r in sorted(hist):
            label = "never" if r == 0 else f"r{r}"
            print(f"{label}: {hist[r]}")
        return
    for name in compute_window(names, green):
        print(name)


if __name__ == "__main__":
    main()

"""Print the registry rotation's drain status: how the next external
gate's 50-slot window is composed, and how much evidence tail remains.

Round-start companion to update_green_hashes.py (run that FIRST — this
tool reports fingerprint-stale entries as never-green, which is correct
behavior but noisy right before the ledger refresh). Output:

- effective-round histogram (a query counts at its latest green round
  only if its recorded fingerprint still matches HEAD);
- the window (first N names with their effective rounds);
- the post-window tail (what the NEXT round's window will drain).

Usage: python tools/drain_status.py [window_size=50]
"""

from __future__ import annotations

import os
import sys
from collections import Counter

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    window = int(sys.argv[1]) if len(sys.argv) > 1 else 50

    from pyspark_etl_project_spark.plans.registry import (
        _latest_green_round,
        _load_green_hashes,
        _order_names,
        _raw_maps,
        query_fingerprint,
    )

    queries, oracle = _raw_maps()
    order = _order_names(queries, oracle)
    green = _latest_green_round()
    ledger = _load_green_hashes()

    def effective(n: str) -> int:
        g = green.get(n, -1)
        ent = ledger.get(n)
        if g < 0 or not isinstance(ent, dict):
            return -1
        if ent.get("hash") != query_fingerprint(queries[n], oracle.get(n)):
            return -1
        return g

    eff = {n: effective(n) for n in order}
    hist = Counter(eff.values())
    print(f"registry: {len(order)} queries, {len(oracle)} oracle twins")
    print("effective-round histogram (-1 = never-green or "
          "fingerprint-stale):")
    for rnd in sorted(hist):
        print(f"  r{rnd:>2}: {hist[rnd]}")

    print(f"\nwindow (next gate's first {window}):")
    for n in order[:window]:
        print(f"  r{eff[n]:>2} {n}")

    tail = order[window:]
    oldest_rnd = min((eff[n] for n in tail), default=-1)
    oldest = [n for n in tail if eff[n] == oldest_rnd]
    print(f"\npost-window tail: {len(tail)} queries; oldest effective "
          f"round r{oldest_rnd} "
          f"({len(oldest)} queries):")
    for n in oldest[:20]:
        print(f"  {n}")


if __name__ == "__main__":
    main()

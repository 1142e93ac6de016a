"""Record gate-time fingerprints for green queries — the ledger behind
the registry's code-change-aware rotation (plans/registry.py).

RUN AT ROUND START, BEFORE EDITING ANYTHING: the previous round's gate
(CORRECTNESS_r{N}.json) ran on the final commit of that round, which is
exactly the tree this tool sees at round start — so the fingerprint it
records for a newly-green query is the fingerprint the gate actually
verified. Running it after edits would stamp post-edit code as
"verified", silently re-aging the query in the rotation.

For each query whose latest green round is NEWER than its ledger entry
(or that has no entry), the current fingerprint is recorded. Entries
are never silently downgraded; --invalidate PATTERN drops entries whose
query watches a module file matching the substring (used when code was
rewritten after its gate round WITHIN the same working session, e.g.
the round-10 bootstrap invalidating everything on streaming/ingest.py).

Usage:
    python tools/update_green_hashes.py [--invalidate SUBSTR ...]
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    invalidate = []
    args = sys.argv[1:]
    while args:
        a = args.pop(0)
        if a == "--invalidate" and args:
            invalidate.append(args.pop(0))
        else:
            raise SystemExit(f"unknown arg {a!r}")

    from pyspark_etl_project_spark.plans.registry import (
        GREEN_HASHES_PATH,
        _latest_green_round,
        _load_green_hashes,
        _raw_maps,
        _watched_files,
        query_fingerprint,
    )

    queries, oracle = _raw_maps()
    green = _latest_green_round()
    ledger = _load_green_hashes()

    updated, dropped = 0, 0
    for name, rnd in sorted(green.items()):
        fn = queries.get(name)
        if fn is None:
            continue  # de-registered query; leave any stale entry behind
        ent = ledger.get(name)
        if not isinstance(ent, dict) or ent.get("round", -1) < rnd:
            ledger[name] = {
                "round": rnd,
                "hash": query_fingerprint(fn, oracle.get(name)),
            }
            updated += 1
    for pat in invalidate:
        for name in list(ledger):
            fn = queries.get(name)
            if fn is not None and any(pat in f for f in _watched_files(fn)):
                del ledger[name]
                dropped += 1

    with open(GREEN_HASHES_PATH, "w") as f:
        json.dump(ledger, f, indent=1, sort_keys=True)
        f.write("\n")
    print(f"GREEN_HASHES.json: {len(ledger)} entries "
          f"({updated} updated, {dropped} invalidated)")


if __name__ == "__main__":
    main()

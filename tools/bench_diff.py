"""Per-query bench comparison — the robust round-over-round statistic.

The r15 verdict's reporting rule: raw totals and even the
floor-normalized scalar swing ±18-25% on a byte-identical engine, so
lead with the per-query ratio DISTRIBUTION (median ratio, count of
regressions >1.25x, count of improvements <0.8x) over the shared query
set, and only then the totals.

Usage:
    python tools/bench_diff.py NEW_DETAIL.json OLD_DETAIL.json
    python tools/bench_diff.py BENCH_DETAIL.json <git-ref>   # old side
        read from `git show REF:BENCH_DETAIL.json`

Prints one human block plus a final single-line JSON summary.
"""

from __future__ import annotations

import json
import statistics
import subprocess
import sys

# Queries whose min-of-5 sits on a long per-JVM warmup curve (SCALE.md
# round 17 convergence census): their cross-round ratio carries a
# ~±2x sampling band on identical bytes — never flag one in isolation.
WARMUP_SENSITIVE = {
    "scd2_merge",
    "streaming_band_index_dedup",
    "streaming_window_agg",
    "hard_negative_mining_ann",
}


def _load(arg: str) -> dict:
    try:
        with open(arg) as f:
            return json.load(f)
    except FileNotFoundError:
        try:
            out = subprocess.run(
                ["git", "show", f"{arg}:BENCH_DETAIL.json"],
                capture_output=True, text=True, check=True)
        except subprocess.CalledProcessError as e:
            raise SystemExit(
                f"bench_diff: {arg!r} is neither a readable JSON file nor "
                f"a git ref with a committed BENCH_DETAIL.json "
                f"(git show: {e.stderr.strip()})")
        return json.loads(out.stdout)


def main() -> int:
    if len(sys.argv) != 3:
        print(__doc__)
        return 2
    new, old = _load(sys.argv[1]), _load(sys.argv[2])
    nq, oq = new["queries"], old["queries"]
    shared = sorted(set(nq) & set(oq))
    zero_old = sorted(q for q in shared if oq[q] <= 0)
    ratios = {q: nq[q] / oq[q] for q in shared if oq[q] > 0}
    regress = {q: r for q, r in ratios.items() if r > 1.25}
    improve = {q: r for q, r in ratios.items() if r < 0.8}
    med = statistics.median(ratios.values()) if ratios else float("nan")

    print(f"shared queries: {len(shared)} "
          f"(new-only: {sorted(set(nq) - set(oq))}, "
          f"old-only: {sorted(set(oq) - set(nq))})")
    if zero_old:
        print(f"excluded from ratio stats (old time <= 0, still in "
              f"totals): {zero_old}")
    print(f"median ratio (new/old): {med:.3f}")
    print(f"regressions >1.25x: {len(regress)}")
    for q, r in sorted(regress.items(), key=lambda kv: -kv[1]):
        print(f"  {q}: {oq[q]:.3f}s -> {nq[q]:.3f}s ({r:.2f}x)")
    print(f"improvements <0.8x: {len(improve)}")
    for q, r in sorted(improve.items(), key=lambda kv: kv[1]):
        print(f"  {q}: {oq[q]:.3f}s -> {nq[q]:.3f}s ({r:.2f}x)")
    nf_new, nf_old = new.get("noise_floor", {}), old.get("noise_floor", {})
    print(f"noise floor new {nf_new} old {nf_old}")
    sum_new = sum(nq[q] for q in shared)
    sum_old = sum(oq[q] for q in shared)
    total_ratio = (sum_new / sum_old) if sum_old > 0 else float("nan")
    print(f"shared-set totals: new {sum_new:.1f}s old {sum_old:.1f}s "
          f"({total_ratio:.2f}x)")
    floor_ratio = net_ratio = None
    fn, fo = nf_new.get("min"), nf_old.get("min")
    if fn and fo and total_ratio == total_ratio:  # floors present, not NaN
        floor_ratio = fn / fo
        net_ratio = total_ratio / floor_ratio
        print(f"CPU-floor drift: {floor_ratio:.2f}x; totals net of floor "
              f"drift: {net_ratio:.2f}x (floor does NOT capture I/O-side "
              f"co-tenancy — see SCALE.md round 17 ambient band)")
    warm = sorted(set(regress) & WARMUP_SENSITIVE)
    if warm:
        print(f"note: warmup-sensitive min-of-5 among regressions "
              f"(~2x sampling band on identical bytes): {warm}")
    print(json.dumps({
        "shared": len(shared), "median_ratio": round(med, 3),
        "zero_old_excluded": zero_old,
        "regressions_gt_1_25": sorted(regress),
        "improvements_lt_0_8": sorted(improve),
        "total_ratio": round(total_ratio, 3),
        "floor_ratio": round(floor_ratio, 3) if floor_ratio else None,
        "total_ratio_net_of_floor":
            round(net_ratio, 3) if net_ratio else None,
        "warmup_sensitive_regressions": warm,
    }))
    return 0


if __name__ == "__main__":
    sys.exit(main())

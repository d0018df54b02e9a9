#!/usr/bin/env python3
"""Round-close BENCH_ref.json refresh (VERDICT r13 #5).

Merges the committed anchor with the round's verified-quiet sweep
(BENCH_full.json): per-key MIN of the two, so the anchor keeps tracking
best-known-quiet; keys no longer declared drop out, new keys enter at
their sweep value. Refuses to run when the sweep's calibration stamps
show a contended host (a noisy sweep must never loosen the anchor).

Usage: python3 tools/refresh_bench_ref.py [BENCH_full.json] [BENCH_ref.json]
"""
import json
import sys


def main(full_path="BENCH_full.json", ref_path="BENCH_ref.json"):
    full = json.load(open(full_path))
    # max of the two stamps: contention during EITHER half of the sweep
    # can inflate a new key's entry (existing keys are protected by the
    # per-key min-merge, new entrants are not)
    calib = max(full.get("calib_before_sec", 9), full.get("calib_after_sec", 9))
    calib_ref = full.get("calib_ref", 0.68)
    if calib > 1.25 * calib_ref:
        print(f"[refresh] REFUSED: sweep calib {calib:.3f} > 1.25x ref "
              f"{calib_ref:.2f} — contended host, anchor not refreshed")
        return 1
    new = full.get("queries_min", {})
    if not new:
        print(f"[refresh] REFUSED: {full_path} has no queries_min — "
              "a truncated sweep must not wipe the anchor")
        return 1
    try:
        old = json.load(open(ref_path)).get("queries_min", {})
    except FileNotFoundError:
        old = {}
    merged = {k: (min(v, old[k]) if k in old else v)
              for k, v in sorted(new.items())}
    entered = sorted(set(new) - set(old))
    dropped = sorted(set(old) - set(new))
    improved = sorted(k for k in new if k in old and new[k] < old[k])
    json.dump({"queries_min": merged, "refreshed_from": full.get("ts"),
               "calib": calib}, open(ref_path, "w"), indent=0)
    print(f"[refresh] {ref_path}: {len(merged)} keys "
          f"({len(improved)} improved, {len(entered)} new, {len(dropped)} dropped)")
    return 0


if __name__ == "__main__":
    sys.exit(main(*sys.argv[1:]))

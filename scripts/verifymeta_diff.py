#!/usr/bin/env python3
"""Cross-round gate-cost trend diff (round 16, r15 judge item #4).

Compares per-entry gate seconds between two VERIFYMETA snapshots
(VERIFYMETA_r{N}.json, written by a full graft.Verify run as
verify_meta_last.json and committed per round) and prints every entry
whose wall changed by more than FACTOR in either direction, plus
entries added/removed. The snapshot pair exists since round 15; this
makes the comparison the one-command check the artifact was built for.

The gate is an untimed single run on a shared box, so single-entry
ratios are noisy — the summary separates entries whose ext_share was
high on EITHER side (box contention, not code) from quiet ones, and
the first entry of a cold Verify session carries 8-12 s of session
warmup (see README). Treat quiet-side regressions as the signal.

Usage: verifymeta_diff.py OLD.json NEW.json [factor]
       verifymeta_diff.py            # picks the two latest VERIFYMETA_r*.json
Exit code 0 always (a trend report, not a gate).
"""
import glob
import json
import os
import re
import sys


def pick_latest_pair():
    files = glob.glob("VERIFYMETA_r*.json")
    def rnd(p):
        m = re.search(r"r(\d+)\.json$", p)
        return int(m.group(1)) if m else -1
    files = sorted((f for f in files if rnd(f) >= 0), key=rnd)
    if len(files) < 2:
        sys.exit("need two VERIFYMETA_r*.json snapshots (found %d)" % len(files))
    return files[-2], files[-1]


def main():
    args = sys.argv[1:]
    factor = 2.0
    if args and re.fullmatch(r"[0-9.]+", args[-1]):
        factor = float(args.pop())
    if len(args) == 2:
        old_p, new_p = args
    elif not args:
        old_p, new_p = pick_latest_pair()
    else:
        sys.exit(__doc__)
    old = json.load(open(old_p))
    new = json.load(open(new_p))
    os_, ns = old.get("seconds", {}), new.get("seconds", {})
    oe, ne = old.get("ext_share", {}), new.get("ext_share", {})
    print(f"gate-cost diff {os.path.basename(old_p)} -> {os.path.basename(new_p)} "
          f"(factor {factor}x; {len(os_)} -> {len(ns)} entries)")
    added = sorted(set(ns) - set(os_))
    removed = sorted(set(os_) - set(ns))
    if added:
        print("added:   " + ", ".join(f"{k} ({ns[k]:.2f}s)" for k in added))
    if removed:
        print("removed: " + ", ".join(f"{k} ({os_[k]:.2f}s)" for k in removed))
    rows = []
    for k in sorted(set(os_) & set(ns)):
        a, b = os_[k], ns[k]
        if a <= 0 or b <= 0:
            continue
        ratio = b / a
        if ratio > factor or ratio < 1.0 / factor:
            loaded = max(oe.get(k, -1), ne.get(k, -1)) > 0.5
            rows.append((ratio, k, a, b, loaded))
    if not rows:
        print(f"no entry changed by more than {factor}x")
        return
    rows.sort(reverse=True)
    for ratio, k, a, b, loaded in rows:
        tag = "  [box-loaded]" if loaded else ""
        print(f"  {k:40s} {a:8.2f}s -> {b:8.2f}s  ({ratio:5.2f}x){tag}")
    quiet = [r for r in rows if not r[4] and r[0] > factor]
    if quiet:
        print(f"{len(quiet)} regression(s) on a quiet box — inspect these first:")
        for _, k, *_ in quiet:
            print(f"  {k}")


if __name__ == "__main__":
    main()

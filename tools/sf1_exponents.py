#!/usr/bin/env python3
"""Exponent table from an sf1 bench artifact (r11 verdict #5).

The artifact's "ratios" map is t(sf1)/t(sf0.1) on a 10x data step, so
exponent = log10(ratio). Prints one row per query sorted by exponent
descending; rows with ratio <= 0 (small-scale error sentinel) print as
ERR. Exit code 1 when any exponent > 1.15 and t(sf1) >= 1 s — the same
"above linear AND big enough to matter" spirit as Bench's superlinear
gate, at a tighter threshold suited to a 35-row curated list.

Usage: python3 tools/sf1_exponents.py docs/bench_sf1_top25.json
"""
import json
import math
import sys


def main():
    path = sys.argv[1] if len(sys.argv) > 1 else "docs/bench_sf1_top25.json"
    d = json.load(open(path))
    ratios = d.get("ratios", {})
    times = d.get("queries", {})
    rows = []
    for name, r in ratios.items():
        t = times.get(name, 0.0)
        exp = math.log10(r) if r > 0 else None
        rows.append((name, t, r, exp))
    rows.sort(key=lambda x: (-(x[3] if x[3] is not None else 99)))
    print(f"{'query':<28} {'t_sf1':>8} {'ratio':>8} {'exponent':>9}")
    flagged = []
    for name, t, r, exp in rows:
        if exp is None:
            print(f"{name:<28} {t:>8.2f} {'ERR':>8} {'ERR':>9}")
            flagged.append(name)
        else:
            mark = " <-- above linear" if exp > 1.15 and t >= 1.0 else ""
            print(f"{name:<28} {t:>8.2f} {r:>8.2f} {exp:>9.2f}{mark}")
            if exp > 1.15 and t >= 1.0:
                flagged.append(name)
    if flagged:
        print(f"\nFLAGGED ({len(flagged)}): {', '.join(sorted(flagged))}")
        sys.exit(1)
    print("\nall rows at-or-near linear on the 10x step")


if __name__ == "__main__":
    main()

#!/usr/bin/env python3
"""Snap-grid overflow sweep: scan a graft.Verify output directory for
DOUBLE columns whose magnitude approaches the snap9 danger zone.

snap9 (round(x*1e9)/1e9) silently diverges between engines once
|x| * 1e9 exceeds 2^53, i.e. |x| >~ 9.007e6 — the class behind the r7
`ts_forecast_reconcile` flapping red row. Output columns are a strong
proxy for snapped operands (snaps are applied on the final select in
almost every query); any double column whose max |x| exceeds the WARN
threshold needs a manual look at its pre-snap operand scale (a 1e8
cent-scale operand can hide behind a 1e6 dollar-scale output).

Usage: python3 tools/snapscan.py <verifyOutDir> [warn_threshold]
Exit code 1 if any column exceeds the hard 9e6 limit.
"""
import glob
import math
import os
import sys

import pyarrow.parquet as pq


def main():
    outdir = sys.argv[1]
    warn = float(sys.argv[2]) if len(sys.argv) > 2 else 1e6
    hard = 9.0e6
    rows = []
    for d in sorted(glob.glob(os.path.join(outdir, "*"))):
        if not os.path.isdir(d):
            continue
        name = os.path.basename(d)
        files = glob.glob(os.path.join(d, "*.parquet"))
        if not files:
            continue
        # read EVERY part: a multi-part output can breach the limit in
        # a partition the first file never sees (r8 advice)
        t = pq.read_table(d)
        for col in t.schema.names:
            if str(t.schema.field(col).type) != "double":
                continue
            vals = [v.as_py() for v in t[col] if v.is_valid]
            finite = [abs(v) for v in vals
                      if v is not None and math.isfinite(v)]
            if not finite:
                continue
            mx = max(finite)
            if mx >= warn:
                rows.append((mx, name, col))
    rows.sort(reverse=True)
    bad = 0
    for mx, name, col in rows:
        flag = "OVER-9e6" if mx >= hard else "warn"
        if mx >= hard:
            bad += 1
        print(f"{flag:9s} {mx:16.3f}  {name}.{col}")
    print(f"== {len(rows)} columns >= {warn:g}, {bad} over the 9e6 hard limit ==")
    sys.exit(1 if bad else 0)


if __name__ == "__main__":
    main()

#!/usr/bin/env python3
"""Compare two Bench JSON lines (e.g. BENCH_r1.json vs BENCH_r2.json):
per-query delta sorted by regression size, plus totals.

Usage: python3 tools/bench_compare.py OLD.json NEW.json [threshold_pct]
"""
import json
import re
import sys


def load(path):
    with open(path) as f:
        text = f.read()
    # accept either a bare JSON object or a log line containing one
    start = text.find('{"metric"')
    try:
        obj = json.loads(text[start:] if start >= 0 else text)
        if "queries" in obj:
            return obj
    except json.JSONDecodeError:
        pass
    # driver wrapper with a truncated "tail" string: recover whatever
    # "name":seconds pairs survive, and the total if present
    obj = {"queries": {}, "value": None}
    for m in re.finditer(r'\\?"([A-Za-z_][\w]*)\\?":([0-9.]+)', text):
        name, val = m.group(1), float(m.group(2))
        if name == "value":
            obj["value"] = val
        elif name not in ("n", "rc", "cpus", "sf", "metric", "unit"):
            obj["queries"][name] = val
    return obj


def main():
    old, new = load(sys.argv[1]), load(sys.argv[2])
    threshold = float(sys.argv[3]) if len(sys.argv) > 3 else 20.0
    oq, nq = old["queries"], new["queries"]
    rows = []
    for name in sorted(set(oq) | set(nq)):
        a, b = oq.get(name), nq.get(name)
        if a is None:
            rows.append((float("inf"), f"  NEW   {name}: {b:.2f}s"))
        elif b is None:
            rows.append((float("-inf"), f"  GONE  {name}: was {a:.2f}s"))
        else:
            pct = (b - a) / a * 100 if a > 0 else 0.0
            flag = "REGR" if pct > threshold else ("IMPR" if pct < -threshold else "    ")
            rows.append((-pct, f"  {flag}  {name}: {a:.2f}s -> {b:.2f}s ({pct:+.0f}%)"))
    for _, line in sorted(rows):
        print(line)
    if old.get("value") and new.get("value"):
        print(f"total: {old['value']:.1f}s -> {new['value']:.1f}s "
              f"({(new['value'] - old['value']) / old['value'] * 100:+.0f}%)")
    else:
        oc = sum(v for k, v in oq.items() if k in nq)
        nc = sum(v for k, v in nq.items() if k in oq)
        print(f"comparable-query totals: {oc:.1f}s -> {nc:.1f}s "
              f"({(nc - oc) / oc * 100:+.0f}%) over {len(set(oq) & set(nq))} queries")


if __name__ == "__main__":
    main()

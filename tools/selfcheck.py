#!/usr/bin/env python3
"""Local replica of the driver's correctness gate.

Runs after `sbt "runMain graft.Verify <sfDir> <outDir>"`:
  - loads each <outDir>/<name>/ parquet result (Spark output),
  - runs the matching oracle SQL from <outDir>/oracle_sql.json in DuckDB
    over the same sfDir parquet tables,
  - sorts columns by name (like the driver), compares row-by-row in order.

Usage: python3 tools/selfcheck.py <sfDir> <outDir>
"""
import glob
import json
import math
import os
import sys

import duckdb
import pyarrow.parquet as pq

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def load_spark(outdir, name):
    files = glob.glob(os.path.join(outdir, name, "*.parquet"))
    if not files:
        return None
    if len(files) != 1:
        raise RuntimeError(
            f"{name}: expected exactly 1 part file, got {len(files)} "
            "(Verify must coalesce(1))")
    t = pq.read_table(files[0])
    return t


def norm(v):
    # normalize pyarrow scalars to python
    return v


def main():
    sfdir, outdir = sys.argv[1], sys.argv[2]
    con = duckdb.connect()
    for t in TABLES:
        p = os.path.join(sfdir, f"{t}.parquet")
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    oracles = json.load(open(os.path.join(outdir, "oracle_sql.json")))
    n_pass = n_fail = 0
    for name, sql in sorted(oracles.items()):
        spark_t = load_spark(outdir, name)
        if spark_t is None:
            print(f"FAIL {name}: no spark output")
            n_fail += 1
            continue
        try:
            duck_t = con.execute(sql).fetch_arrow_table()
        except Exception as e:
            print(f"FAIL {name}: duckdb error: {e}")
            n_fail += 1
            continue
        # sort columns by name (driver behavior)
        s_cols = sorted(spark_t.column_names)
        d_cols = sorted(duck_t.column_names)
        if s_cols != d_cols:
            print(f"FAIL {name}: columns differ spark={s_cols} duck={d_cols}")
            n_fail += 1
            continue
        # Arrow-type compare (driver's hash is typed: HUGEINT != BIGINT even
        # when every value is equal). string/large_string and timestamp-unit
        # differences are representation-only and hash the same after the
        # driver's value render, so normalize those.
        def _norm_type(t):
            s = str(t)
            if s == "large_string":
                return "string"
            if s.startswith("timestamp"):
                return "timestamp"
            return s
        t_bad = [(c, str(spark_t.schema.field(c).type), str(duck_t.schema.field(c).type))
                 for c in s_cols
                 if _norm_type(spark_t.schema.field(c).type)
                 != _norm_type(duck_t.schema.field(c).type)]
        if t_bad:
            c, a, b = t_bad[0]
            print(f"FAIL {name}: arrow type mismatch col {c}: spark={a} duck={b}"
                  + (f" (+{len(t_bad)-1} more)" if len(t_bad) > 1 else ""))
            n_fail += 1
            continue
        if spark_t.num_rows != duck_t.num_rows:
            print(f"FAIL {name}: rows spark={spark_t.num_rows} duck={duck_t.num_rows}")
            n_fail += 1
            continue
        s_rows = spark_t.select(s_cols).to_pylist()
        d_rows = duck_t.select(d_cols).to_pylist()
        bad = None
        maxdiff = 0.0
        for i, (sr, dr) in enumerate(zip(s_rows, d_rows)):
            for c in s_cols:
                a, b = sr[c], dr[c]
                if isinstance(a, float) and isinstance(b, float):
                    if a != b:
                        if math.isnan(a) and math.isnan(b):
                            continue
                        maxdiff = max(maxdiff, abs(a - b))
                        if bad is None:
                            bad = (i, c, a, b)
                elif a != b:
                    if bad is None:
                        bad = (i, c, a, b)
        if bad:
            i, c, a, b = bad
            print(f"FAIL {name}: first diff row {i} col {c}: spark={a!r} duck={b!r} (maxfloatdiff={maxdiff})")
            n_fail += 1
        else:
            print(f"PASS {name} ({spark_t.num_rows} rows)")
            n_pass += 1
    print(f"== {n_pass} pass / {n_fail} fail ==")
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()

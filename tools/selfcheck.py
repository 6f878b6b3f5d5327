#!/usr/bin/env python3
"""Local replica of the driver's correctness gate.

Runs after `sbt "runMain graft.Verify <sfDir> <outDir>"`:
  - loads each <outDir>/<name>/ parquet result (Spark output),
  - runs the matching oracle SQL from <outDir>/oracle_sql.json in DuckDB
    over the same sfDir parquet tables,
  - sorts columns by name (like the driver), compares row-by-row in order.

Usage: python3 tools/selfcheck.py <sfDir> <outDir>

Oracle results are cached under .selfcheck_cache/ keyed by
(oracle SQL, data fingerprint of the sfDir parquet files): the DuckDB
side of the full-surface sf0.1 gate is a multi-hour job dominated by a
handful of quadratic formulations, and an oracle whose SQL and input
bytes are unchanged provably returns the same table — re-running it
buys nothing. A cache hit skips con.execute and compares the Spark
output against the cached arrow table, so the comparison itself stays
exactly the driver's. Disable with SELFCHECK_CACHE=0; the cache dir is
gitignored.
"""
import glob
import hashlib
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


def data_fingerprint(sfdir):
    """(path, size, mtime_ns) of every table file — parquet files are
    immutable in practice (testdata is read-only; generators rewrite
    whole directories), so this is a sound identity for 'same bytes'."""
    parts = []
    for t in TABLES:
        p = os.path.join(sfdir, f"{t}.parquet")
        if os.path.isfile(p):
            st = os.stat(p)
            parts.append(f"{t}:{st.st_size}:{st.st_mtime_ns}")
        elif os.path.isdir(p):  # Spark-written directory table
            for f in sorted(glob.glob(os.path.join(p, "*.parquet"))):
                st = os.stat(f)
                parts.append(f"{t}/{os.path.basename(f)}:{st.st_size}:{st.st_mtime_ns}")
    return ";".join(parts)


def main():
    sfdir, outdir = sys.argv[1], sys.argv[2]
    con = duckdb.connect()
    for t in TABLES:
        p = os.path.join(sfdir, f"{t}.parquet")
        if os.path.exists(p):
            # Spark-written tables (ScaleUp's data/sf1) are DIRECTORIES
            # of part files; DuckDB's read_parquet treats a bare dir
            # path as a glob that matches nothing
            pat = os.path.join(p, "*.parquet") if os.path.isdir(p) else p
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{pat}')")
    oracles = json.load(open(os.path.join(outdir, "oracle_sql.json")))
    use_cache = os.environ.get("SELFCHECK_CACHE", "1") != "0"
    cache_dir = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), ".selfcheck_cache")
    data_fp = data_fingerprint(sfdir) if use_cache else ""
    if use_cache:
        os.makedirs(cache_dir, exist_ok=True)
    n_pass = n_fail = n_cached = 0
    for name, sql in sorted(oracles.items()):
        spark_t = load_spark(outdir, name)
        if spark_t is None:
            print(f"FAIL {name}: no spark output")
            n_fail += 1
            continue
        cache_path = None
        duck_t = None
        if use_cache:
            # the engine version participates in the key (ADVICE r11): a
            # duckdb upgrade changes what the oracle WOULD return, so a
            # cache keyed only on (data, SQL) would silently serve the
            # old engine's results across the upgrade boundary
            key = hashlib.md5((duckdb.__version__ + "\x00" + data_fp
                               + "\x00" + sql).encode()).hexdigest()
            cache_path = os.path.join(cache_dir, f"{key}.parquet")
            if os.path.exists(cache_path):
                try:
                    duck_t = pq.read_table(cache_path)
                    n_cached += 1
                except Exception:
                    duck_t = None
        if duck_t is None:
            try:
                duck_t = con.execute(sql).fetch_arrow_table()
            except Exception as e:
                print(f"FAIL {name}: duckdb error: {e}")
                n_fail += 1
                continue
            if cache_path is not None:
                try:
                    # write via a temp file so a killed run never leaves a
                    # torn cache entry, then compare against the READ-BACK
                    # table: cached and uncached runs see byte-identical
                    # parquet-normalized types (large_string/timestamp-unit
                    # shifts are already handled by _norm_type below)
                    tmp = cache_path + ".tmp"
                    pq.write_table(duck_t, tmp)
                    os.replace(tmp, cache_path)
                    duck_t = pq.read_table(cache_path)
                except Exception:
                    try:
                        os.remove(cache_path)
                    except OSError:
                        pass
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
    cached_note = f" ({n_cached} oracle results from cache)" if n_cached else ""
    print(f"== {n_pass} pass / {n_fail} fail =={cached_note}")
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()

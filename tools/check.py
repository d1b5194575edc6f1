#!/usr/bin/env python3
"""Local mirror of the driver's DuckDB-oracle correctness gate.

Usage: python3 tools/check.py <sfDir> <outDir> [query ...]

Assumes `sbt "runMain graft.Verify <sfDir> <outDir>"` already ran. For each
query in <outDir>/oracle_sql.json: run the oracle in DuckDB against views over
the sfDir parquet tables, load the Spark parquet output, sort columns by name
and rows by all columns, compare exactly (float equality is exact — queries are
designed to be bit-deterministic via decimal-exact aggregation).
"""
import json, math, os, sys
import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

def norm(df):
    df = df[sorted(df.columns)]
    df = df.sort_values(by=list(df.columns)).reset_index(drop=True)
    return df

def cell_eq(a, b):
    if a is None and b is None:
        return True
    try:
        if isinstance(a, float) or isinstance(b, float):
            if a is None or b is None:
                return False
            if math.isnan(a) and math.isnan(b):
                return True
            return float(a) == float(b)
    except TypeError:
        pass
    # pandas NaN/NaT handling
    import pandas as pd
    if pd.isna(a) and pd.isna(b):
        return True
    if pd.isna(a) or pd.isna(b):
        return False
    return a == b

def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    only = set(sys.argv[3:])
    con = duckdb.connect()
    # Results are re-sorted by norm() before comparing, so DuckDB need not
    # preserve insertion order — turning it off lets large oracle queries
    # (qd41 at sf10) stream instead of buffering whole intermediates, which
    # slashes the out-of-core temp footprint (the sf10 qd41 oracle spilled
    # past this sandbox's ~80 GB free-disk ceiling with it on). Optional
    # GRAFT_DUCKDB_THREADS bounds concurrent operator instances (peak temp)
    # the same way.
    con.execute("SET preserve_insertion_order=false")
    if os.environ.get("GRAFT_DUCKDB_THREADS"):
        con.execute(f"SET threads={int(os.environ['GRAFT_DUCKDB_THREADS'])}")
    for t in TABLES:
        # driver testdata tables are single parquet FILES; ScaleUp scale
        # fixtures (/tmp/graft_sf1, /tmp/graft_sf10) are parquet DIRECTORIES
        p = f"{sf_dir}/{t}.parquet"
        src = f"'{p}/*.parquet'" if os.path.isdir(p) else f"'{p}'"
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM {src}")
    with open(f"{out_dir}/oracle_sql.json") as f:
        oracles = json.load(f)
    n_ok = n_bad = 0
    for name, sql in sorted(oracles.items()):
        if only and name not in only:
            continue
        try:
            want = norm(con.sql(sql).df())
            got = norm(duckdb.sql(f"SELECT * FROM '{out_dir}/{name}/*.parquet'").df())
        except Exception as e:
            print(f"FAIL {name}: load/exec error: {e}")
            n_bad += 1
            continue
        if list(want.columns) != list(got.columns):
            print(f"FAIL {name}: columns want={list(want.columns)} got={list(got.columns)}")
            n_bad += 1
            continue
        if len(want) != len(got):
            print(f"FAIL {name}: rows want={len(want)} got={len(got)}")
            n_bad += 1
            continue
        bad = None
        for ci, c in enumerate(want.columns):
            wv, gv = want[c].tolist(), got[c].tolist()
            for ri in range(len(wv)):
                if not cell_eq(wv[ri], gv[ri]):
                    bad = (c, ri, wv[ri], gv[ri])
                    break
            if bad:
                break
        if bad:
            c, ri, w, g = bad
            print(f"FAIL {name}: col={c} row={ri} want={w!r} got={g!r}")
            n_bad += 1
        else:
            print(f"OK   {name} ({len(want)} rows x {len(want.columns)} cols)")
            n_ok += 1
    print(f"== {n_ok} ok, {n_bad} failed ==")
    sys.exit(1 if n_bad else 0)

if __name__ == "__main__":
    main()

#!/usr/bin/env python3
"""Local replica of the driver's t2 correctness gate.

Usage: python3 tools/check_oracle.py <verifyOutDir> <sfDir>

For every <name>/ parquet dir under verifyOutDir, runs the matching SQL
from oracle_sql.json in DuckDB (tables = views over sfDir parquet) and
compares: schema (column names), row count, and values (columns sorted
by name; floats compared with tolerance; also strict row-order check).
"""
import json, sys, math

import duckdb

def norm(v):
    # exact float compare: the decimal-exact aggregate scheme should make
    # results bitwise identical across engines (stricter than any driver
    # tolerance).
    if isinstance(v, float) and math.isnan(v):
        return "nan"
    return v

def main(out_dir, sf_dir):
    con = duckdb.connect()
    for tname in ("region nation customer supplier part orders lineitem "
                  "events documents embeddings").split():
        con.execute(f"CREATE VIEW {tname} AS SELECT * FROM "
                    f"'{sf_dir}/{tname}.parquet'")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    failures = 0
    for name, sql in sorted(oracle.items()):
        try:
            got = con.sql(
                f"SELECT * FROM '{out_dir}/{name}/*.parquet'")
            got_cols = got.columns
            got_rows = got.fetchall()
            exp = con.sql(sql)
            exp_cols = exp.columns
            exp_rows = exp.fetchall()
            # Replicate the driver's pandas path: dtype equality (q16's
            # r1 hash "mismatch" was HUGEINT vs BIGINT dtype only) and a
            # sort_values over every column (crashes on array-typed
            # cells exactly like the driver's harness did for q53/56/60).
            gdf = con.sql(
                f"SELECT * FROM '{out_dir}/{name}/*.parquet'").df()
            edf = con.sql(sql).df()
            gd = {c: str(gdf[c].dtype) for c in gdf.columns}
            ed = {c: str(edf[c].dtype) for c in edf.columns}
            if gd != ed:
                print(f"FAIL {name}: dtypes {gd} != {ed}")
                failures += 1
                continue
            gdf.sort_values(by=sorted(gdf.columns), inplace=True)
            edf.sort_values(by=sorted(edf.columns), inplace=True)
        except Exception as e:
            print(f"FAIL {name}: error {e}")
            failures += 1
            continue
        if sorted(got_cols) != sorted(exp_cols):
            print(f"FAIL {name}: columns {sorted(got_cols)} != {sorted(exp_cols)}")
            failures += 1
            continue
        if len(got_rows) != len(exp_rows):
            print(f"FAIL {name}: rows {len(got_rows)} != {len(exp_rows)}")
            failures += 1
            continue
        # reorder got columns to expected order by name
        gidx = [got_cols.index(c) for c in exp_cols]
        bad = 0
        for i, (g, e) in enumerate(zip(got_rows, exp_rows)):
            gv = tuple(norm(g[j]) for j in gidx)
            ev = tuple(norm(x) for x in e)
            if gv != ev:
                if bad == 0:
                    print(f"FAIL {name}: row {i} got={gv} exp={ev}")
                bad += 1
        if bad:
            print(f"FAIL {name}: {bad}/{len(got_rows)} rows differ")
            failures += 1
        else:
            print(f"OK   {name}: {len(got_rows)} rows")
    print(f"\n{'ALL OK' if failures == 0 else f'{failures} FAILURES'}")
    return failures

if __name__ == "__main__":
    sys.exit(1 if main(sys.argv[1], sys.argv[2]) else 0)

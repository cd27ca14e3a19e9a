#!/usr/bin/env python3
"""Local replica of the driver's t2 correctness gate (dev tool only, not
part of the shipped library): run Verify's parquet dumps against the
DuckDB oracle SQL and diff values exactly.

Usage: python3 tools/compare.py <sfDir> <outDir>
"""
import json
import math
import sys

import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def canon(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return repr(v)
    return str(v)


def frame(rows, cols):
    # driver-style: sort columns by name, keep row order as produced
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    return [tuple(canon(r[i]) for i in order) for r in rows]


def main(sf_dir, out_dir):
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_pass = n_fail = 0
    for name, sql in sorted(oracle.items()):
        try:
            got_rel = con.sql(f"SELECT * FROM '{out_dir}/{name}/*.parquet'")
            got_cols, got = got_rel.columns, got_rel.fetchall()
            exp_rel = con.sql(sql)
            exp_cols, exp = exp_rel.columns, exp_rel.fetchall()
        except Exception as e:
            print(f"FAIL {name}: error {str(e)[:200]}")
            n_fail += 1
            continue
        if sorted(got_cols) != sorted(exp_cols):
            print(f"FAIL {name}: cols {sorted(got_cols)} != {sorted(exp_cols)}")
            n_fail += 1
            continue
        g, e = frame(got, got_cols), frame(exp, exp_cols)
        if g == e:
            print(f"PASS {name} ({len(g)} rows)")
            n_pass += 1
        else:
            n_fail += 1
            if sorted(g) == sorted(e):
                print(f"FAIL {name}: row ORDER differs only ({len(g)} rows)")
            else:
                print(f"FAIL {name}: values differ (got {len(g)} rows, want {len(e)})")
                sg, se = set(g), set(e)
                for r in list(se - sg)[:3]:
                    print(f"   want: {r}")
                for r in list(sg - se)[:3]:
                    print(f"   got : {r}")
    print(f"\n{n_pass} pass / {n_fail} fail")
    return 1 if n_fail else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))

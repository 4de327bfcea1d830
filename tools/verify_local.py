#!/usr/bin/env python3
"""Local stand-in for the driver's t2 correctness gate.

Reads the parquet dumps produced by `graft.Verify <sfDir> <outDir>` plus
outDir/oracle_sql.json, runs each oracle SQL in DuckDB over the same
parquet tables, and compares: schema (column names), row count, and
values (columns sorted by name, rows in produced order).

Usage: tools/verify_local.py /root/testdata/sf0.01 /tmp/verify_out
"""
import json, math, sys
import duckdb
import pandas as pd

TABLES = ["region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings"]

def canon(df):
    df = df.reindex(sorted(df.columns), axis=1)
    return df.reset_index(drop=True)

def values_equal(a, b):
    if a is None and b is None:
        return True
    if isinstance(a, float) or isinstance(b, float):
        try:
            af, bf = float(a), float(b)
        except (TypeError, ValueError):
            return False
        if math.isnan(af) and math.isnan(bf):
            return True
        return af == bf  # exact: the driver hashes, so close isn't enough
    if isinstance(a, (list, tuple)) or isinstance(b, (list, tuple)):
        la, lb = list(a), list(b)
        return len(la) == len(lb) and all(values_equal(x, y) for x, y in zip(la, lb))
    return str(a) == str(b)

def main(sf_dir, out_dir):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_pass = n_fail = 0
    for name, sql in sorted(oracle.items()):
        try:
            got = canon(pd.read_parquet(f"{out_dir}/{name}"))
        except Exception as e:
            print(f"FAIL {name}: spark output unreadable: {e}")
            n_fail += 1
            continue
        try:
            exp = canon(con.sql(sql).df())
        except Exception as e:
            print(f"FAIL {name}: duckdb error: {e}")
            n_fail += 1
            continue
        if list(got.columns) != list(exp.columns):
            print(f"FAIL {name}: columns spark={list(got.columns)} duckdb={list(exp.columns)}")
            n_fail += 1
            continue
        if len(got) != len(exp):
            print(f"FAIL {name}: rows spark={len(got)} duckdb={len(exp)}")
            n_fail += 1
            continue
        # The driver hashes stringified values, so an int64 column on one
        # side rendered float64 on the other ("123" vs "123.0") is a FAIL
        # even though float(a)==float(b). Catch dtype-kind drift here.
        kind_drift = [
            (c, str(got[c].dtype), str(exp[c].dtype))
            for c in got.columns
            if {got[c].dtype.kind, exp[c].dtype.kind} == {"i", "f"}
        ]
        if kind_drift:
            print(f"FAIL {name}: int/float dtype drift {kind_drift}")
            n_fail += 1
            continue
        bad = []
        for ci, c in enumerate(got.columns):
            gv, ev = got[c].tolist(), exp[c].tolist()
            for ri in range(len(gv)):
                if not values_equal(gv[ri], ev[ri]):
                    bad.append((ri, c, gv[ri], ev[ri]))
                    if len(bad) >= 3:
                        break
            if len(bad) >= 3:
                break
        if bad:
            print(f"FAIL {name}: value mismatches {bad}")
            n_fail += 1
        else:
            print(f"PASS {name} ({len(got)} rows)")
            n_pass += 1
    print(f"\n{n_pass} passed, {n_fail} failed, "
          f"{len(oracle)} oracle-checked")
    return 1 if n_fail else 0

if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))

#!/usr/bin/env python3
"""Local emulation of the driver's t2 correctness gate.

Runs each oracle SQL (from Verify's oracle_sql.json) in DuckDB over the
testdata parquet tables, reads the Spark result parquet written by
graft.Verify, and compares: row count, column names, and value-hash of
the sorted rows. Dev tool only — NOT part of the Scala library.

Usage: python3 scripts/check_oracle.py <sfDir> <verifyOutDir>
"""
import sys, json, glob, math, os
import decimal
import duckdb
import pyarrow.parquet as pq


def canon(v):
    if v is None:
        return "NULL"
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        # driver-style float canonicalization: repr at full precision
        return repr(v)
    if isinstance(v, bool):
        return repr(v)
    if isinstance(v, decimal.Decimal):
        # Keep decimals distinct from ints so a HUGEINT/decimal128 oracle
        # column (e.g. un-cast SUM(integer)) fails against Spark's int64
        # here, the same way it fails the driver's hash gate.
        return f"decimal:{v}"
    return str(v)


def table_rows(cols, batches):
    rows = []
    for b in batches:
        rows.extend(tuple(canon(x) for x in r) for r in b)
    rows.sort()
    return rows


def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    con = duckdb.connect()
    for p in glob.glob(f"{sf_dir}/*.parquet"):
        name = os.path.basename(p)[:-len(".parquet")]
        con.execute(f"CREATE VIEW {name} AS SELECT * FROM read_parquet('{p}')")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_pass = n_fail = 0
    for name, sql in sorted(oracle.items()):
        spark_dir = f"{out_dir}/{name}"
        status, detail = "PASS", ""
        try:
            # Arrow fetch matches the driver's typing: e.g. DuckDB's
            # SUM(integer) HUGEINT surfaces as decimal128(38,0) here but
            # as a plain int via fetchall() — fetchall() would hide that.
            dt = con.execute(sql).arrow()
            dcols = dt.column_names
            drows = ([tuple(canon(x) for x in r)
                      for r in zip(*[c.to_pylist() for c in dt.columns])]
                     if dt.num_rows else [])
            drows.sort()
        except Exception as e:
            print(f"FAIL {name}: oracle error: {e}")
            n_fail += 1
            continue
        try:
            t = pq.read_table(spark_dir)
            scols = t.column_names
            srows = [tuple(canon(x) for x in r) for r in zip(*[c.to_pylist() for c in t.columns])] if t.num_rows else []
            srows.sort()
        except Exception as e:
            print(f"FAIL {name}: spark result unreadable: {e}")
            n_fail += 1
            continue
        # compare with columns sorted by name (driver semantics)
        dperm = sorted(range(len(dcols)), key=lambda i: dcols[i])
        sperm = sorted(range(len(scols)), key=lambda i: scols[i])
        if sorted(dcols) != sorted(scols):
            status, detail = "FAIL", f"cols duck={sorted(dcols)} spark={sorted(scols)}"
        else:
            drows2 = sorted(tuple(r[i] for i in dperm) for r in drows)
            srows2 = sorted(tuple(r[i] for i in sperm) for r in srows)
            if len(drows2) != len(srows2):
                status, detail = "FAIL", f"rows duck={len(drows2)} spark={len(srows2)}"
            elif drows2 != srows2:
                diffs = [(a, b) for a, b in zip(drows2, srows2) if a != b][:3]
                status, detail = "FAIL", f"value mismatch, first diffs: {diffs}"
        if status == "PASS":
            n_pass += 1
        else:
            n_fail += 1
        print(f"{status} {name} ({len(srows)} rows) {detail}")
    print(f"== {n_pass} pass, {n_fail} fail ==")
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()

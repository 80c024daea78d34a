#!/usr/bin/env python3
"""Local stand-in for the driver's correctness gate (NOT part of the library).

Usage: python3 tools/check.py <sfDir> <verifyOutDir>

Runs each oracle_sql.json query in DuckDB over the same parquet tables,
reads the Spark result parquet, sorts columns by name, canonicalizes
values, and reports match/mismatch per query.
"""
import sys, os, json, glob, datetime, decimal

import duckdb
import pyarrow.parquet as pq


def canon(v):
    if v is None:
        return "NULL"
    if isinstance(v, float):
        if v != v:
            return "NaN"
        return repr(v)
    if isinstance(v, decimal.Decimal):
        return str(v)
    if isinstance(v, datetime.datetime):
        return v.isoformat()
    if isinstance(v, datetime.date):
        return v.isoformat()
    return str(v)


def rows_of_table(tbl):
    cols = sorted(tbl.column_names)
    data = [tbl.column(c).to_pylist() for c in cols]
    return cols, [tuple(canon(v) for v in row) for row in zip(*data)] if data else (cols, [])


def main(sf_dir, out_dir):
    con = duckdb.connect()
    for p in glob.glob(os.path.join(sf_dir, "*.parquet")):
        name = os.path.basename(p)[: -len(".parquet")]
        con.execute(f"CREATE VIEW {name} AS SELECT * FROM read_parquet('{p}')")
    oracle = json.load(open(os.path.join(out_dir, "oracle_sql.json")))
    ok = bad = 0
    for name in sorted(oracle):
        spark_dir = os.path.join(out_dir, name)
        if not os.path.isdir(spark_dir):
            print(f"MISSING  {name} (no spark output)")
            bad += 1
            continue
        stbl = pq.read_table(spark_dir)
        try:
            dtbl = con.execute(oracle[name]).fetch_arrow_table()
        except Exception as e:
            print(f"ORACLE-ERR {name}: {e}")
            bad += 1
            continue
        scols, srows = rows_of_table(stbl)
        dcols, drows = rows_of_table(dtbl)
        if [c.lower() for c in scols] != [c.lower() for c in dcols]:
            print(f"COLS     {name}: spark={scols} duck={dcols}")
            bad += 1
            continue
        if srows != drows:
            n = len(srows)
            m = len(drows)
            diff = next((i for i in range(min(n, m)) if srows[i] != drows[i]), None)
            print(f"DIFF     {name}: rows {n} vs {m}; first diff at {diff}:")
            if diff is not None:
                print(f"  spark: {srows[diff]}")
                print(f"  duck : {drows[diff]}")
            bad += 1
            continue
        print(f"OK       {name} ({len(srows)} rows)")
        ok += 1
    print(f"\n{ok} ok, {bad} bad")
    return 1 if bad else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))

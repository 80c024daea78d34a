#!/usr/bin/env python3
"""Local stand-in for the driver's correctness gate (NOT part of the library).

Usage: python3 tools/check.py <sfDir> <verifyOutDir>

Runs each oracle_sql.json query in DuckDB over the same parquet tables,
reads the Spark result parquet, sorts columns by name, canonicalizes
values, and reports match/mismatch per query.
"""
import sys, os, json, glob, datetime, decimal

import duckdb
import pyarrow as pa
import pyarrow.parquet as pq


def type_class(t):
    """Rendering class of an arrow type: the driver hashes CANONICALIZED
    text, so two engines agree iff their output types render identically.
    DuckDB sum() returns HUGEINT (decimal128(38,0) via arrow) while Spark
    emits int64 — identical values, different fixed-scale rendering, hash
    fail (the g01/t21/q31/q33 bug class, four times now). Flagging the
    class mismatch here catches it at local-verify time."""
    if pa.types.is_integer(t):
        return "int"
    if pa.types.is_floating(t):
        return "float"
    if pa.types.is_decimal(t):
        return f"decimal(scale={t.scale})"
    if pa.types.is_timestamp(t):
        # unit + tz-awareness matter: us-vs-ns or aware-vs-naive renders
        # differently in the driver's canonicalized hash (same bug class
        # the guard exists for) — don't collapse them into one class
        return f"timestamp({t.unit},tz={bool(t.tz)})"
    if pa.types.is_date(t):
        return "date"
    if pa.types.is_boolean(t):
        return "bool"
    if pa.types.is_string(t) or pa.types.is_large_string(t):
        return "string"
    if pa.types.is_list(t) or pa.types.is_large_list(t):
        return "list"
    return str(t)


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
        sfields = sorted(stbl.schema, key=lambda f: f.name.lower())
        dfields = sorted(dtbl.schema, key=lambda f: f.name.lower())
        drift = [
            (sf.name, type_class(sf.type), type_class(df.type))
            for sf, df in zip(sfields, dfields)
            if type_class(sf.type) != type_class(df.type)
        ]
        if drift:
            det = ", ".join(f"{c}: spark={s} duck={d}" for c, s, d in drift)
            print(f"TYPE-DRIFT {name}: {det} (driver hash would differ "
                  f"even on equal values — cast the oracle column)")
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

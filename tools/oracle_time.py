#!/usr/bin/env python3
"""Time every oracle_sql.json query in DuckDB over the same parquet —
the judge-style engine-vs-engine comparison (NOT part of the library).

Usage: python3 tools/oracle_time.py <sfDir> <verifyOutDir> [out.json]

Runs each oracle once warm-up-free is NOT attempted (DuckDB has no JIT
warm-up to speak of; the first-query view bind is amortized across 200+
queries), records per-query seconds, and prints a one-line JSON record
plus the Spark-side comparison when bench_last.json exists. Compare
TOTALS, not per-gate multiples, and classify per-gate outliers before
calling them weak (write-work gates, oracle-asymmetric-by-design salted
joins, iterative per-round constants — see COVERAGE.md).
"""
import sys, os, json, glob, time

import duckdb


def main(sf_dir, out_dir, out_json=None):
    con = duckdb.connect()
    for p in glob.glob(os.path.join(sf_dir, "*.parquet")):
        name = os.path.basename(p)[: -len(".parquet")]
        con.execute(f"CREATE VIEW {name} AS SELECT * FROM read_parquet('{p}')")
    oracle = json.load(open(os.path.join(out_dir, "oracle_sql.json")))
    times, failed = {}, []
    for name in sorted(oracle):
        t0 = time.time()
        try:
            con.execute(oracle[name]).fetch_arrow_table()
            times[name] = round(time.time() - t0, 3)
        except Exception as e:
            failed.append(name)
            print(f"[oracle_time] {name} FAILED: {e}", file=sys.stderr)
    rec = {"metric": "duckdb_oracle_total",
           "value": round(sum(times.values()), 3), "unit": "sec",
           "n": len(times), "failed": failed, "sf": sf_dir,
           "queries": times}
    if out_json:
        json.dump(rec, open(out_json, "w"), indent=0, sort_keys=True)
    print(json.dumps({k: rec[k] for k in
                      ("metric", "value", "unit", "n", "failed", "sf")}))
    if os.path.exists("bench_last.json"):
        spark = json.load(open("bench_last.json"))
        shared = set(times) & set(spark.get("queries", {}))
        s_tot = sum(spark["queries"][k] for k in shared)
        d_tot = sum(times[k] for k in shared)
        print(json.dumps({
            "shared_gates": len(shared),
            "spark_sec": round(s_tot, 1),
            "duckdb_sec": round(d_tot, 1),
            "spark_over_duckdb": round(s_tot / d_tot, 2) if d_tot else None,
        }))
        worst = sorted(
            ((k, round(spark["queries"][k] / max(times[k], 1e-3), 1))
             for k in shared if spark["queries"][k] >= 1.0),
            key=lambda kv: -kv[1])[:10]
        print("worst same-scale multiples (>=1s Spark):", worst)


if __name__ == "__main__":
    if len(sys.argv) < 3:
        sys.exit("usage: oracle_time.py <sfDir> <verifyOutDir> [out.json]")
    main(sys.argv[1], sys.argv[2],
         sys.argv[3] if len(sys.argv) > 3 else None)

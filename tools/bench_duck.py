#!/usr/bin/env python3
"""Time DuckDB executing every oracle query from a Verify dump — the
comparison column for BENCH_LOCAL.md.
Usage: python3 tools/bench_duck.py <sfDir> <verifyOutDir> [threads]
"""
import duckdb, json, sys, time

TABLES = ["region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings"]

def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    threads = sys.argv[3] if len(sys.argv) > 3 else "32"
    con = duckdb.connect()
    con.sql(f"SET threads TO {threads}")
    for t in TABLES:
        con.sql(f"create view {t} as select * from read_parquet('{sf_dir}/{t}.parquet')")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    times, total = {}, 0.0
    for name, sql in sorted(oracle.items()):
        t0 = time.time()
        try:
            con.sql(f"create or replace temp table __out as ({sql})")
            con.sql("drop table __out")
            dt = time.time() - t0
            total += dt
        except Exception as e:
            dt = -1
            print(f"ERR {name}: {str(e)[:120]}", file=sys.stderr)
        times[name] = round(dt, 3)
    print(json.dumps({"metric": "duckdb_total", "value": round(total, 3),
                      "unit": "sec", "queries": times, "sf": sf_dir}))

if __name__ == "__main__":
    main()

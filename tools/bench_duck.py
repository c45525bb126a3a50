#!/usr/bin/env python3
"""Time DuckDB executing every oracle query from a Verify dump — the
comparison column for BENCH_LOCAL.md.

Protocol (pinned round 11): each query runs once unmeasured, then once
measured — the same per-query warm-then-measure steady-state protocol
Bench applies on the Spark side, so both columns measure the recurring
cost with the FS page cache and any engine caches warm. Process-CPU
seconds are recorded alongside wall for every query: on a shared box,
wall-clock swings with co-tenant load (the r9/r10 sessions measured
the same code at 0.95x and 1.56x purely on DuckDB-side wall swings)
while CPU-time tracks plan cost, so cross-session gate comparisons
should read the cpu_* fields.

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
    times, cpu_times, total, cpu_total = {}, {}, 0.0, 0.0

    def run_once(sql):
        con.sql(f"create or replace temp table __out as ({sql})")
        con.sql("drop table __out")

    for name, sql in sorted(oracle.items()):
        try:
            run_once(sql)  # warm: page cache + any engine caches
            c0, t0 = time.process_time(), time.time()
            run_once(sql)
            dt, cdt = time.time() - t0, time.process_time() - c0
            total += dt
            cpu_total += cdt
        except Exception as e:
            dt, cdt = -1, -1
            print(f"ERR {name}: {str(e)[:120]}", file=sys.stderr)
        times[name] = round(dt, 3)
        cpu_times[name] = round(cdt, 3)
    print(json.dumps({"metric": "duckdb_total", "value": round(total, 3),
                      "unit": "sec", "queries": times, "sf": sf_dir,
                      "cpu_sec": round(cpu_total, 3), "cpu_queries": cpu_times}))

if __name__ == "__main__":
    main()

#!/usr/bin/env python3
"""DuckDB comparator with a per-query watchdog (dev tool only).

Same record shape as bench_oracle.py but each oracle gets at most
`timeout` seconds (default 120): a watchdog thread calls
connection.interrupt() and the query is recorded as timed_out with
t = timeout (a LOWER bound on DuckDB's true cost — noted in the
output). Exists for the sf1 stand-in sweep, where a few chained-CTE
replay oracles (HITS / recursive closures) are known to blow up
superlinearly in DuckDB.

Usage: python3 scripts/bench_oracle_timeout.py <sfDir> <oracle_sql.json> \
    <spark_bench.json> <out.json> [timeout_sec]
"""
import json
import sys
import threading
import time

import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings"]


def main():
    sf_dir, oracle_path, spark_path, out_path = sys.argv[1:5]
    timeout = float(sys.argv[5]) if len(sys.argv) > 5 else 120.0
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    oracles = json.load(open(oracle_path))
    spark = json.load(open(spark_path))["queries"]

    times, timed_out = {}, []
    for name in sorted(oracles):
        if name not in spark:
            continue
        sql = oracles[name]
        done = threading.Event()

        def watchdog():
            if not done.wait(timeout):
                con.interrupt()

        w = threading.Thread(target=watchdog, daemon=True)
        t0 = time.time()
        w.start()
        try:
            con.sql(sql).fetchall()
            times[name] = time.time() - t0
        except Exception as e:
            dt = time.time() - t0
            if dt >= timeout - 1:
                times[name] = timeout
                timed_out.append(name)
            else:
                times[name] = dt
                timed_out.append(f"{name} (error: {str(e)[:80]})")
        finally:
            done.set()
        print(f"[oracle] {name}: {times[name]:.2f}s"
              + (" TIMEOUT" if name in timed_out else ""), flush=True)

    out = {
        "sf_dir": sf_dir,
        "timeout_sec": timeout,
        "duckdb_total_sec_lower_bound": sum(times.values()),
        "spark_total_sec": sum(v for k, v in spark.items() if k in times),
        "timed_out": timed_out,
        "queries": times,
    }
    json.dump(out, open(out_path, "w"), indent=1)
    print(f"totals: spark {out['spark_total_sec']:.1f}s, duckdb >= "
          f"{out['duckdb_total_sec_lower_bound']:.1f}s "
          f"({len(timed_out)} timeouts at {timeout:.0f}s)")


if __name__ == "__main__":
    main()

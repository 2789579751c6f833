#!/usr/bin/env python3
"""DuckDB comparator with a per-query watchdog (dev tool only).

Same record shape as bench_oracle.py but each oracle gets at most
`timeout` seconds (default 120): a watchdog thread calls
connection.interrupt(). Exists for the sf1 stand-in sweep, where a few
oracles replay deliberately-gated quadratic baselines (exact all-pairs
cosine / recursive-CTE closures) that blow up superlinearly in DuckDB.

r13 change (the r12 verdict's "stop publishing a lower bound" item):
queries named in EXCLUDED_QUADRATIC are a DOCUMENTED excluded class —
they are still run (with the watchdog) and recorded per-query, but
their times are kept OUT of the headline totals, so
`duckdb_total_sec` / `spark_total_sec` compare the same completed set
on both engines instead of a timeout-floored lower bound. Any OTHER
query that times out still lands in `timed_out` and poisons the total
(that is a regression signal, not an excluded baseline).

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

# The six known-blowup oracle baselines (the SAME six timeouts in
# every sf1 sweep since r10): exact all-pairs embedding cosine (q50),
# clustering/closure replays DuckDB runs as recursive CTEs
# (q67, q87, q179), iterated HITS rounds (q161), and the exact
# containment self-join (q173). Each replays a deliberately-gated
# exact baseline or an iterative closure whose SQL form is
# superlinear by construction; the Spark side runs the same semantics
# in seconds.
EXCLUDED_QUADRATIC = {
    "q50_dedup_embedding_cosine", "q67_neardup_clusters",
    "q87_corpus_curation", "q161_hits_trade", "q173_containment_pairs",
    "q179_cluster_keep_best",
}


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
        tag = (" EXCLUDED-QUADRATIC" if name in EXCLUDED_QUADRATIC else "") \
            + (" TIMEOUT" if name in timed_out else "")
        print(f"[oracle] {name}: {times[name]:.2f}s{tag}", flush=True)

    matched = {k: v for k, v in times.items() if k not in EXCLUDED_QUADRATIC}
    unexpected = [t for t in timed_out
                  if t.split(" ")[0] not in EXCLUDED_QUADRATIC]
    with open("/proc/sys/kernel/random/boot_id") as f:
        boot = f.read().strip().split("-")[0]
    import socket
    out = {
        "box": f"{socket.gethostname()}/{boot}",
        "sf_dir": sf_dir,
        "timeout_sec": timeout,
        "excluded_quadratic": sorted(EXCLUDED_QUADRATIC & set(times)),
        "excluded_quadratic_duckdb_sec": {
            k: times[k] for k in sorted(EXCLUDED_QUADRATIC & set(times))},
        "excluded_quadratic_spark_sec": {
            k: spark[k] for k in sorted(EXCLUDED_QUADRATIC & set(times))},
        "n_matched": len(matched),
        "duckdb_total_sec": sum(matched.values()),
        "spark_total_sec": sum(v for k, v in spark.items() if k in matched),
        "timed_out_outside_excluded_class": unexpected,
        "timed_out": timed_out,
        "queries": times,
    }
    json.dump(out, open(out_path, "w"), indent=1)
    print(f"totals over {len(matched)} matched (excluded class held out): "
          f"spark {out['spark_total_sec']:.1f}s, duckdb "
          f"{out['duckdb_total_sec']:.1f}s; "
          f"{len(unexpected)} unexpected timeouts")


if __name__ == "__main__":
    main()

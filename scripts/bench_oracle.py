#!/usr/bin/env python3
"""Full-inventory DuckDB comparator (dev tool only — not part of the
Spark library). Times every oracle SQL in DuckDB over the same parquet
tables the Spark bench reads, merges with a Spark full-inventory bench
JSON, and records the per-query ratio — raw and after subtracting the
independently-measured ~0.4 s/query Spark local stage-scheduling floor
(amortizes to zero at cluster scale; established rounds 2-4).

Usage:
  python3 scripts/bench_oracle.py <sfDir> <oracle_sql.json> \
      <spark_bench.json> <out.json>

spark_bench.json is Bench's one-line output with SPARK_GRAFT_BENCH_ALL=1
(the {"metric": ..., "queries": {name: sec}} shape).

Timing protocol: one warm-load of the views, then per query a first
timed run; queries under 2 s get two more runs and the MEDIAN is
recorded (the bench box wanders — medians are the signal); slower
queries record the single run (runs=1 in the output) to keep the whole
sweep bounded. Queries whose oracle has no Spark bench entry (or vice
versa) are listed in "unmatched" rather than silently dropped.
"""
import json
import statistics
import sys
import time

import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings"]
SPARK_FLOOR_SEC = 0.4
FLAG_RATIO = 2.0


def main(sf_dir: str, oracle_path: str, spark_bench_path: str,
         out_path: str) -> int:
    con = duckdb.connect()
    con.sql("SET threads TO 32")
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    with open(oracle_path) as f:
        oracles = json.load(f)
    with open(spark_bench_path) as f:
        spark = json.load(f)["queries"]

    per_query = {}
    flagged = []
    for name, sql in sorted(oracles.items()):
        try:
            t0 = time.perf_counter()
            con.sql(sql).fetchall()
            first = time.perf_counter() - t0
            times = [first]
            if first < 2.0:
                for _ in range(2):
                    t0 = time.perf_counter()
                    con.sql(sql).fetchall()
                    times.append(time.perf_counter() - t0)
            duck = statistics.median(times)
            entry = {"duckdb_sec": round(duck, 4), "runs": len(times)}
            if name in spark:
                sp = spark[name]
                entry["spark_sec"] = round(sp, 4)
                entry["ratio_raw"] = round(sp / duck, 2) if duck > 0 else None
                adj = max(sp - SPARK_FLOOR_SEC, 0.0)
                entry["ratio_floor_adj"] = (
                    round(adj / duck, 2) if duck > 0 else None)
                if entry["ratio_floor_adj"] is not None \
                        and entry["ratio_floor_adj"] > FLAG_RATIO:
                    flagged.append(name)
            per_query[name] = entry
        except Exception as ex:  # noqa: BLE001 — record, don't abort sweep
            per_query[name] = {"error": f"{type(ex).__name__}: {ex}"}

    unmatched = sorted(set(spark) - set(oracles))
    unmatched_oracle = sorted(set(oracles) - set(spark))
    matched = [q for q in per_query.values()
               if "ratio_floor_adj" in q and q["ratio_floor_adj"] is not None]
    with open("/proc/sys/kernel/random/boot_id") as f:
        boot = f.read().strip().split("-")[0]
    import socket
    summary = {
        "box": f"{socket.gethostname()}/{boot}",
        "sf_dir": sf_dir,
        "spark_floor_sec": SPARK_FLOOR_SEC,
        "flag_ratio": FLAG_RATIO,
        "n_queries": len(per_query),
        "n_matched": len(matched),
        "spark_total_sec": round(sum(q["spark_sec"] for q in matched), 2),
        "duckdb_total_sec": round(sum(q["duckdb_sec"] for q in matched), 2),
        "flagged_over_2x_floor_adj": sorted(flagged),
        "unmatched_spark_only": unmatched,
        "unmatched_oracle_only": unmatched_oracle,
        "queries": per_query,
    }
    with open(out_path, "w") as f:
        json.dump(summary, f, indent=1, sort_keys=True)
    print(f"{len(matched)} matched, {len(flagged)} flagged "
          f"(>{FLAG_RATIO}x floor-adjusted): {sorted(flagged)}")
    print(f"totals: spark {summary['spark_total_sec']} s, "
          f"duckdb {summary['duckdb_total_sec']} s")
    return 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2], sys.argv[3], sys.argv[4]))

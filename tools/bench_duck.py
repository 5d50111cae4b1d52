#!/usr/bin/env python3
"""Time the DuckDB oracle suite (the judge's comparison baseline).

Usage: python3 tools/bench_duck.py <sfDir> <verifyOutDir-with-oracle_sql.json>

Runs every oracle SQL once against <sfDir>'s parquet tables and prints
per-query + total seconds, mirroring how the judge measures Spark-vs-DuckDB.
"""
import sys, json, os, time
import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    con = duckdb.connect()
    for t in TABLES:
        p = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    oracles = json.load(open(os.path.join(out_dir, "oracle_sql.json")))
    times = {}
    for name in sorted(oracles):
        t0 = time.time()
        try:
            con.execute(oracles[name]).fetchall()
            times[name] = time.time() - t0
        except Exception as e:
            times[name] = time.time() - t0
            print(f"ERR {name}: {e}")
    total = sum(times.values())
    for k, v in sorted(times.items(), key=lambda x: -x[1])[:15]:
        print(f"{v:7.2f}  {k}")
    print(f"== total {total:.1f} s over {len(times)} queries ==")
    # full per-query map for ratio tracking (same shape as bench_full.json)
    side = os.environ.get("GRAFT_DUCK_OUT", "")
    if side:
        json.dump({"total": total, "queries": times}, open(side, "w"))

if __name__ == "__main__":
    main()

#!/usr/bin/env python3
"""Local replica of the driver's DuckDB-oracle correctness gate.

Usage: python3 tools/check.py <sfDir> <verifyOutDir>

Reads each <verifyOutDir>/<name>/ parquet (Spark output), runs the matching
oracle SQL from <verifyOutDir>/oracle_sql.json in DuckDB over <sfDir>'s
parquet tables, and compares row sets (columns sorted by name, rows sorted,
values stringified). Mirrors what we understand of the driver's t2 check so
oracle-SQL mistakes surface before the round boundary.
"""
import sys, json, glob, os, threading
import duckdb

# Optional per-oracle wall cap (seconds) for out-of-band scale gates
# (sf10's DuckDB side can run minutes per query); unset = no cap, the
# driver-replica default.
TIMEOUT_S = float(os.environ.get("GRAFT_CHECK_TIMEOUT", "0") or 0)

# Opt-in in-engine compare (bag equality via EXCEPT ALL both directions,
# computed inside DuckDB): the default Python-side normalization is the
# driver-replica path but materializes every row twice in Python — at the
# sf10 gate a single 60M-row result takes longer to stringify than to
# compute. In-engine compares value equality instead of repr equality
# (identical for every type the suite emits; both sides are read/produced
# by the same DuckDB session).
INENGINE = os.environ.get("GRAFT_CHECK_INENGINE", "") not in ("", "0")

# Optional name filter (regex, matched anywhere) for resuming partial scale
# gates; unset = all queries (driver-replica default).
ONLY = os.environ.get("GRAFT_CHECK_ONLY", "")

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

def norm_cell(v):
    if v is None:
        return "NULL"
    if isinstance(v, float):
        if v != v:
            return "NaN"
        return repr(v)
    return str(v)

def norm_rows(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = [tuple(norm_cell(r[i]) for i in order) for r in rows]
    out.sort()
    return [c for c in sorted(cols)], out

def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    con = duckdb.connect()
    # In-memory connections have no temp_directory, so big oracle CTE chains
    # cannot spill and die with bad-allocation OOMs; point spilling at disk.
    spill = os.environ.get("GRAFT_CHECK_SPILL", "/tmp/graft_duck_spill")
    if spill:
        os.makedirs(spill, exist_ok=True)
        con.execute(f"SET temp_directory='{spill}'")
        con.execute(f"SET max_temp_directory_size="
                    f"'{os.environ.get('GRAFT_CHECK_SPILL_MAX', '60GiB')}'")
    # Out-of-band scale gates: a hard memory_limit makes DuckDB spill instead
    # of growing into the kernel OOM-killer (default 80% of RAM is fatal on a
    # box whose Spark dumps it also reads); fewer threads = less concurrent
    # operator state for the non-spillable chains. Unset = driver-replica
    # defaults.
    mem = os.environ.get("GRAFT_CHECK_MEM", "")
    if mem:
        con.execute(f"SET memory_limit='{mem}'")
    thr = os.environ.get("GRAFT_CHECK_THREADS", "")
    if thr:
        con.execute(f"SET threads={int(thr)}")
    for t in TABLES:
        p = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    oracles = json.load(open(os.path.join(out_dir, "oracle_sql.json")))
    n_pass = n_fail = 0
    import re as _re
    for name, sql in sorted(oracles.items()):
        if ONLY and not _re.search(ONLY, name):
            continue
        spark_dir = os.path.join(out_dir, name)
        files = glob.glob(os.path.join(spark_dir, "*.parquet"))
        if not files:
            print(f"FAIL {name}: no spark output at {spark_dir}")
            n_fail += 1
            continue
        timer = None
        if TIMEOUT_S > 0:
            timer = threading.Timer(TIMEOUT_S, con.interrupt)
            timer.start()
        try:
            if INENGINE:
                got_cols = [d[0] for d in con.execute(
                    f"SELECT * FROM read_parquet({files!r}) LIMIT 0").description]
                exp_cols = [d[0] for d in con.execute(
                    f"SELECT * FROM ({sql}) LIMIT 0").description]
                if sorted(got_cols) != sorted(exp_cols):
                    print(f"FAIL {name}: columns differ spark={sorted(got_cols)} oracle={sorted(exp_cols)}")
                    n_fail += 1
                    continue
                cols = ", ".join(f'"{c}"' for c in sorted(got_cols))
                ga = f"SELECT {cols} FROM read_parquet({files!r})"
                ob = f"SELECT {cols} FROM ({sql})"
                # Materialize each side ONCE: referencing the oracle subquery
                # directly in both EXCEPT ALL arms plus the count would run
                # the whole oracle (and its MATERIALIZED CTE chain) three
                # times in one statement — at the sf10 gate that tripled the
                # heavy oracles' spill and pushed n1/n2 over the temp cap.
                con.execute(f"CREATE OR REPLACE TEMP TABLE __graft_got AS {ga}")
                con.execute(f"CREATE OR REPLACE TEMP TABLE __graft_exp AS {ob}")
                n_spark, n_oracle, n_diff = con.execute(
                    """SELECT (SELECT count(*) FROM __graft_got),
                               (SELECT count(*) FROM __graft_exp),
                               (SELECT count(*) FROM (
                                  (SELECT * FROM __graft_got
                                   EXCEPT ALL SELECT * FROM __graft_exp)
                                  UNION ALL
                                  (SELECT * FROM __graft_exp
                                   EXCEPT ALL SELECT * FROM __graft_got)))""").fetchone()
                con.execute("DROP TABLE __graft_got")
                con.execute("DROP TABLE __graft_exp")
                if n_spark != n_oracle or n_diff:
                    print(f"FAIL {name}: {n_spark} vs {n_oracle} rows; {n_diff} bag-diff rows")
                    n_fail += 1
                else:
                    print(f"PASS {name} ({n_spark} rows)", flush=True)
                    n_pass += 1
                continue
            got = con.execute(
                f"SELECT * FROM read_parquet({files!r})").fetchall()
            got_cols = [d[0] for d in con.description]
            exp = con.execute(sql).fetchall()
            exp_cols = [d[0] for d in con.description]
        except Exception as e:
            print(f"FAIL {name}: exec error: {e}")
            n_fail += 1
            continue
        finally:
            if timer is not None:
                timer.cancel()
        if INENGINE:
            continue  # compared above
        gc, gr = norm_rows(got_cols, got)
        ec, er = norm_rows(exp_cols, exp)
        if gc != ec:
            print(f"FAIL {name}: columns differ spark={gc} oracle={ec}")
            n_fail += 1
        elif gr != er:
            diff = [(a, b) for a, b in zip(gr, er) if a != b][:3]
            print(f"FAIL {name}: {len(gr)} vs {len(er)} rows; first diffs: {diff}")
            n_fail += 1
        else:
            print(f"PASS {name} ({len(gr)} rows)")
            n_pass += 1
    print(f"== {n_pass} pass, {n_fail} fail ==")
    sys.exit(1 if n_fail else 0)

if __name__ == "__main__":
    main()

#!/usr/bin/env python3
"""Probe a candidate DuckDB oracle SQL against a parquet tier with a
hard wall-clock cap, in a FORKED process (an uncapped recursive-CTE
oracle once burned 2 h CPU / 17 GB — never probe inline).

Usage: python3 tools/oracle_probe.py <sfDir> <sqlFile> [capSeconds=120]
Prints: OK <secs>s <rows> rows   |   TIMEOUT>caps   |   ERROR <msg>
Dev tool only — not part of the shipped library.
"""
import sys, os, time, multiprocessing as mp

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def run(sf_dir, sql, q):
    import duckdb
    con = duckdb.connect()
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        if os.path.isdir(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}/*.parquet')")
        elif os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    t0 = time.time()
    try:
        n = len(con.execute(sql).fetchall())
        q.put(("OK", round(time.time() - t0, 1), n))
    except Exception as e:
        q.put(("ERROR", round(time.time() - t0, 1), str(e)[:500]))


def main():
    sf_dir, sql_file = sys.argv[1], sys.argv[2]
    cap = int(sys.argv[3]) if len(sys.argv) > 3 else 120
    sql = open(sql_file).read()
    q = mp.Queue()
    p = mp.Process(target=run, args=(sf_dir, sql, q))
    p.start()
    p.join(cap)
    if p.is_alive():
        p.terminate()
        p.join()
        print(f"TIMEOUT>{cap}s")
        return 1
    try:
        # the child can die WITHOUT posting (OOM-kill, native segfault,
        # failed duckdb import) — a blocking get() would hang the
        # watchdog itself (review r10)
        status, secs, extra = q.get(timeout=5)
    except Exception:
        print(f"CHILD_DIED exit={p.exitcode} (no result posted)")
        return 1
    print(f"{status} {secs}s {extra}{' rows' if status == 'OK' else ''}")
    return 0 if status == "OK" else 1


if __name__ == "__main__":
    sys.exit(main())

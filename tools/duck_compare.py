#!/usr/bin/env python3
"""Big-output gate compare, entirely inside DuckDB (the r10 sf10
method, now a committed tool): for outputs past the python sorter's
practical limit (~1M rows), compare the Spark dump against the oracle
SQL with count equality + symmetric EXCEPT ALL = 0 — value-identical,
strictly STRONGER than the sorted-hash compare (EXCEPT ALL is
multiset difference; no hash collisions, no float-print rounding).

Usage: python3 tools/duck_compare.py <sfDir> <dumpDir> <query> [capSeconds=900]
Prints: OK(<rows>) [<secs>s]  |  ROWCOUNT a=.. b=..  |  DIFF <sample rows>
Dev tool only — not part of the shipped library.
"""
import sys, os, json, time, glob, multiprocessing as mp

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def run(sf_dir, dump_dir, name, q):
    import duckdb
    con = duckdb.connect()
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        if os.path.isdir(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}/*.parquet')")
        elif os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    sql = json.load(open(f"{dump_dir}/oracle_sql.json"))[name]
    dump = glob.glob(f"{dump_dir}/{name}/*.parquet")
    assert dump, f"no parquet dump under {dump_dir}/{name}"
    t0 = time.time()
    con.execute(f"CREATE VIEW spark_side AS SELECT * FROM read_parquet('{dump[0]}')")
    con.execute(f"CREATE TABLE oracle_side AS {sql}")
    cols = [r[0] for r in con.execute(
        "SELECT column_name FROM information_schema.columns "
        "WHERE table_name='oracle_side' ORDER BY column_name").fetchall()]
    sel = ", ".join(f'"{c}"' for c in cols)
    na = con.execute("SELECT count(*) FROM spark_side").fetchone()[0]
    nb = con.execute("SELECT count(*) FROM oracle_side").fetchone()[0]
    if na != nb:
        q.put(("ROWCOUNT", time.time() - t0, f"spark={na} oracle={nb}"))
        return
    diff = con.execute(
        f"(SELECT {sel} FROM spark_side EXCEPT ALL SELECT {sel} FROM oracle_side) "
        f"UNION ALL "
        f"(SELECT {sel} FROM oracle_side EXCEPT ALL SELECT {sel} FROM spark_side) "
        f"LIMIT 5").fetchall()
    if diff:
        q.put(("DIFF", time.time() - t0, str(diff)[:400]))
    else:
        q.put(("OK", time.time() - t0, na))


def main():
    sf_dir, dump_dir, name = sys.argv[1:4]
    cap = int(sys.argv[4]) if len(sys.argv) > 4 else 900
    q = mp.Queue()
    p = mp.Process(target=run, args=(sf_dir, dump_dir, name, q))
    p.start()
    p.join(cap)
    if p.is_alive():
        p.terminate()
        print(f"{name}  TIMEOUT>{cap}s")
        return 1
    status, secs, detail = q.get()
    if status == "OK":
        print(f"{name}  OK({detail}) [duckdb-except {secs:.0f}s]")
        return 0
    print(f"{name}  {status} {detail} [{secs:.0f}s]")
    return 1


if __name__ == "__main__":
    sys.exit(main())

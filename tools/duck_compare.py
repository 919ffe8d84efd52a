#!/usr/bin/env python3
"""Big-output gate compare, entirely inside DuckDB (the r10 sf10
method, now a committed tool): for outputs past the python sorter's
practical limit (~1M rows), compare the Spark dump against the oracle
SQL with count equality + symmetric EXCEPT ALL = 0 — value-identical,
strictly STRONGER than the sorted-hash compare (EXCEPT ALL is
multiset difference; no hash collisions, no float-print rounding).

Usage: python3 tools/duck_compare.py <sfDir> <dumpDir> <query> [capSeconds=900]
         [--hashsum]
Prints: OK(<rows>) [<secs>s]  |  ROWCOUNT a=.. b=..  |  DIFF <sample rows>

--hashsum: streaming multiset compare — count(*) plus TWO independent
128-bit sums of per-row 64-bit hashes (hash(row) and hash(hash(row),
salt)) on each side, O(1) aggregate state, neither side materialized.
EXCEPT ALL is value-exact but needs a hash table over BOTH sides
(~100 GB state at 600M rows each — past this host); the hash-sum is
the out-of-core form for those tiers. Guarantee (weaker than EXCEPT
ALL, stated honestly): a single sum can be fooled not just by a hash
collision but by CANCELLING deltas (swap A->B on one row and B->A on
another); passing BOTH independent sums requires the deltas to cancel
in two unrelated hash spaces simultaneously — astronomically unlikely
but not impossible.
Dev tool only — not part of the shipped library.
"""
import sys, os, json, time, glob, multiprocessing as mp

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def run(sf_dir, dump_dir, name, q, hashsum=False):
    import duckdb
    con = duckdb.connect()
    # Bound memory and let sorts/hashes spill: an in-memory DuckDB has
    # no temp_directory, so a 600M-row distinct-window oracle was
    # OOM-killed at 130 GB RSS (sf100 tier) instead of going out of
    # core. Cap below the host and point spill at /tmp; DUCK_MEM tunes
    # the split when disk, not RAM, is the scarce resource (the sf100
    # window sorts need mem+spill ≈ 2× the 600M-row working set —
    # at 56GB the spill share exceeded this host's free disk).
    con.execute(f"SET memory_limit='{os.environ.get('DUCK_MEM', '56GB')}'")
    con.execute("SET temp_directory='/tmp/duck_compare_spill'")
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
    # read the WHOLE dump dir (the ADVICE r12 dump[0] class): Verify
    # coalesce(1)s today, but a first-part-only read would silently
    # drop rows from any future multi-part dump
    con.execute(f"CREATE VIEW spark_side AS SELECT * FROM "
                f"read_parquet('{dump_dir}/{name}/*.parquet')")
    if hashsum:
        cols = [r[0] for r in con.execute(
            "DESCRIBE spark_side").fetchall()]
        sel = ", ".join(f'"{c}"' for c in sorted(cols))
        # two INDEPENDENT aggregates: a cancelling pair of row edits
        # (A->B here, B->A there) zeroes one sum only if the same
        # deltas also cancel under the salted re-hash — two unrelated
        # 64-bit spaces must conspire, vs one for the single sum.
        probe = (lambda side:
            con.execute(f"SELECT count(*), sum(CAST(hash({sel}) AS HUGEINT)), "
                        f"sum(CAST(hash(hash({sel}), 'graft_r12_salt') AS HUGEINT)) "
                        f"FROM ({side}) t").fetchone())
        na, ha, h2a = probe("SELECT * FROM spark_side")
        nb, hb, h2b = probe(sql)
        if na != nb:
            q.put(("ROWCOUNT", time.time() - t0, f"spark={na} oracle={nb}"))
        elif ha != hb or h2a != h2b:
            q.put(("HASHSUM_DIFF", time.time() - t0,
                   f"spark=({ha},{h2a}) oracle=({hb},{h2b})"))
        else:
            q.put(("OK", time.time() - t0, f"{na}, hashsum"))
        return
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
    hashsum = "--hashsum" in sys.argv
    argv = [a for a in sys.argv if a != "--hashsum"]
    sf_dir, dump_dir, name = argv[1:4]
    cap = int(argv[4]) if len(argv) > 4 else 900
    q = mp.Queue()
    p = mp.Process(target=run, args=(sf_dir, dump_dir, name, q, hashsum))
    p.start()
    p.join(cap)
    if p.is_alive():
        p.terminate()
        print(f"{name}  TIMEOUT>{cap}s")
        return 1
    if q.empty():
        # child died without reporting (OOM kill, segfault): say so
        # instead of blocking forever on q.get()
        print(f"{name}  CHILD_DIED exit={p.exitcode}")
        return 1
    status, secs, detail = q.get()
    method = "duckdb-hashsum" if hashsum else "duckdb-except"
    if status == "OK":
        print(f"{name}  OK({detail}) [{method} {secs:.0f}s]")
        return 0
    print(f"{name}  {status} {detail} [{secs:.0f}s]")
    return 1


if __name__ == "__main__":
    sys.exit(main())

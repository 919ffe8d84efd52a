#!/usr/bin/env python3
"""Local correctness self-check: mimic the driver's t2 gate.

Runs after `sbt "runMain graft.Verify <sfDir> <outDir>"`:
for each query result parquet under outDir, re-run the matching
oracle SQL (outDir/oracle_sql.json) in DuckDB over the same sfDir
parquet tables, and compare schema (column names), row count, and
values (rows sorted, columns sorted by name — per the driver's
documented compare). Dev tool only — not part of the shipped library.

Usage: python3 tools/selfcheck.py <sfDir> <outDir>
"""
import sys, json, glob, os
import duckdb
import pyarrow.parquet as pq

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def norm(v):
    if v is None:
        return (0, "")          # nulls sort first, uniformly
    if isinstance(v, float):
        return (1, str(round(v, 9)))
    return (1, str(v))


def main(sf_dir, out_dir):
    con = duckdb.connect()
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    results = {}
    for qdir in sorted(glob.glob(f"{out_dir}/*/")):
        name = os.path.basename(qdir.rstrip("/"))
        marker = f"{qdir}/_FAILED.txt"
        if os.path.exists(marker):
            results[name] = "FAILED: " + open(marker).read().strip()[:200]
            continue
        files = glob.glob(f"{qdir}/*.parquet")
        if not files:
            results[name] = "NO_OUTPUT"
            continue
        spark_tbl = pq.read_table(files[0])
        if name not in oracle:
            results[name] = f"ROWS_ONLY({spark_tbl.num_rows})"
            continue
        try:
            duck = con.execute(oracle[name]).fetch_arrow_table()
        except Exception as e:
            results[name] = f"ORACLE_SQL_ERROR: {e}"
            continue
        s_cols = sorted(spark_tbl.column_names)
        d_cols = sorted(duck.column_names)
        if s_cols != d_cols:
            results[name] = f"SCHEMA_MISMATCH spark={s_cols} duck={d_cols}"
            continue
        s_rows = sorted(tuple(norm(v) for v in row)
                        for row in zip(*[spark_tbl.column(c).to_pylist() for c in s_cols]))
        d_rows = sorted(tuple(norm(v) for v in row)
                        for row in zip(*[duck.column(c).to_pylist() for c in d_cols]))
        if len(s_rows) != len(d_rows):
            results[name] = f"ROWCOUNT spark={len(s_rows)} duck={len(d_rows)}"
        elif s_rows != d_rows:
            diff = next((i, a, b) for i, (a, b) in enumerate(zip(s_rows, d_rows)) if a != b)
            results[name] = f"VALUE_MISMATCH first at row {diff[0]}: spark={diff[1]} duck={diff[2]}"
        else:
            results[name] = f"OK({len(s_rows)})"
    width = max(len(k) for k in results) if results else 0
    n_ok = sum(1 for v in results.values() if v.startswith(("OK", "ROWS_ONLY")))
    for k in sorted(results):
        print(f"{k:<{width}}  {results[k]}")
    print(f"\n{n_ok}/{len(results)} pass")
    # Gate-shrinkage check: Verify records how many queries SparkEntry
    # registers; a query whose dump silently vanished (round 4: 8 of
    # them) must turn this red with the count mismatch named, not
    # produce a smaller all-green gate.
    shrank = False
    err_path = f"{out_dir}/_errors.json"
    if os.path.exists(err_path):
        meta = json.load(open(err_path))
        expected = meta.get("expected", 0)
        if len(results) != expected:
            print(f"GATE SHRANK: {len(results)} dump dirs but SparkEntry "
                  f"registers {expected} queries — missing: check Verify stderr")
            shrank = True
    else:
        print("GATE UNVERIFIED: no _errors.json in out dir — Verify died "
              "before finishing, or pre-round-5 dump; treat as red")
        shrank = True
    return 0 if (n_ok == len(results) and not shrank) else 1


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))

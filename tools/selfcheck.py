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
    return 0 if n_ok == len(results) else 1


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))

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


def type_family(t):
    """Coarse arrow type family, mirroring what the driver's
    type-sensitive hash distinguishes. Round-5 lesson: stringified
    values hide decimal128-vs-int64 divergence (ly_compaction), so the
    local gate must compare *types*, not just values."""
    import pyarrow.types as pt
    if pt.is_decimal(t):
        return "decimal"        # always a hard failure, either side
    if pt.is_boolean(t):
        return "bool"
    if pt.is_integer(t):
        return "int"
    if pt.is_floating(t):
        return "float"
    if pt.is_string(t) or pt.is_large_string(t):
        return "string"
    if pt.is_binary(t) or pt.is_large_binary(t):
        return "binary"
    if pt.is_timestamp(t):
        return "timestamp"
    if pt.is_date(t):
        return "date"
    if pt.is_list(t) or pt.is_large_list(t) or pt.is_fixed_size_list(t):
        return "list<%s>" % type_family(t.value_type)
    return str(t)


def type_check(name, spark_tbl, duck):
    """Return an error string if column type families diverge or either
    side emits a decimal column; None when clean."""
    s_types = {f.name: f.type for f in spark_tbl.schema}
    d_types = {f.name: f.type for f in duck.schema}
    for side, types in (("spark", s_types), ("duck", d_types)):
        for c, t in types.items():
            fam = type_family(t)
            if "decimal" in fam:
                return (f"DECIMAL_COLUMN {side}.{c} is {t} — cast it "
                        f"(oracle: CAST(... AS BIGINT/DOUBLE)); the "
                        f"driver hash is type-sensitive")
            if fam.startswith("list<") or "list<" in fam:
                # Round-6 lesson (s_kmeans): the driver's pandas
                # comparer sort_values-es every column and dies on
                # array cells. The gate contract is SCALAR COLUMNS
                # ONLY — posexplode arrays to rows or emit a checksum.
                return (f"LIST_COLUMN {side}.{c} is {t} — gate contract "
                        f"is scalar-only (driver comparer cannot sort "
                        f"arrays); posexplode to rows or checksum")
    for c in s_types:
        if c not in d_types:
            continue            # name mismatch reported separately
        sf, df = type_family(s_types[c]), type_family(d_types[c])
        if sf != df:
            return (f"TYPE_MISMATCH col={c} spark={s_types[c]}({sf}) "
                    f"duck={d_types[c]}({df})")
    return None


def main(sf_dir, out_dir):
    con = duckdb.connect()
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        if os.path.isdir(p):
            # Spark-written tier (e.g. the ScaleUp sf1 corpus): the
            # table is a DIRECTORY of part files, not one file
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}/*.parquet')")
        elif os.path.exists(p):
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
        terr = type_check(name, spark_tbl, duck)
        if terr:
            results[name] = terr
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

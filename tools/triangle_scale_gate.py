#!/usr/bin/env python3
"""Disjoint-replica triangle gate (VERDICT r11 item 4): turns the
"exactly 100x the sf0.1 graph" wall note into an equality-checked row.

ScaleUp replicates every scalable key domain with offset copy*base, so
copy i of lineitem co-purchases only copy-i parts: the co-occurrence
graph of an xN corpus is N DISJOINT isomorphic copies of the base
graph, and every census component (nodes, edges, wedges, triangles) is
exactly N x the base value. DuckDB cannot count triangles at 119.6M
edges (documented wall, bench/sf10_gate_r11.txt), but it CAN:
  1. count the base census at the reference tier (sf0.1, ~10 s), and
  2. census-guard the disjointness premise ON THE BIG CORPUS itself:
     (a) zero orders mix parts from different copies (an id-collision
         or a wrong offset would cross copies and break isomorphism),
     (b) distinct order/part counts are exactly N x the base counts
         (a dropped or duplicated replica would shift them).
The gate then checks Spark's FULL census at the big tier (the
g_triangle_count dump) == N x DuckDB's base census, component by
component. Any violation of the premise fails the guard BEFORE the
prediction is trusted.

Usage: python3 tools/triangle_scale_gate.py <bigDir> <refDir> <factor>
         <sparkDumpDir>   # dumpDir holds g_triangle_count/*.parquet
Prints one gate line per check; exits non-zero on any failure.
Dev/gate tool only — not part of the shipped library.
"""
import sys, glob, time


def views(con, d, prefix):
    for t in ("lineitem", "part", "orders"):
        import os
        p = f"{d}/{t}.parquet"
        src = f"'{p}/*.parquet'" if os.path.isdir(p) else f"'{p}'"
        con.execute(
            f"CREATE VIEW {prefix}{t} AS SELECT * FROM read_parquet({src})")


def main():
    big_dir, ref_dir, factor_s, dump_dir = sys.argv[1:5]
    factor = int(factor_s)
    import duckdb
    con = duckdb.connect()
    con.execute("SET temp_directory='/tmp/tri_gate_spill'")
    views(con, big_dir, "big_")
    views(con, ref_dir, "ref_")
    ok = True

    def check(name, got, want):
        nonlocal ok
        good = got == want
        ok = ok and good
        print(f"{name:34s} {'OK' if good else 'FAIL'}  got={got} want={want}")

    # base for the copy-id arithmetic: ScaleUp offsets every key by
    # copy * (max original key + 1), so base comes from the REF tier
    base_part = con.execute(
        "SELECT max(p_partkey) + 1 FROM ref_part").fetchone()[0]
    base_order = con.execute(
        "SELECT max(o_orderkey) + 1 FROM ref_orders").fetchone()[0]

    # guard (a): no order mixes parts of different copies — one linear
    # scan + agg over the big corpus; a single crossing edge breaks
    # the disjoint-isomorphic-copies premise and must fail loudly
    t0 = time.time()
    crossing = con.execute(
        f"""SELECT count(*) FROM (
              SELECT l_orderkey FROM big_lineitem
              GROUP BY l_orderkey
              HAVING min(l_partkey // {base_part})
                  <> max(l_partkey // {base_part}))""").fetchone()[0]
    check("guard_cross_copy_orders", crossing, 0)
    # ...and order keys agree with their own copy id (an order in copy
    # i must hold copy-i parts — catches consistent-but-shifted joins)
    mismatched = con.execute(
        f"""SELECT count(*) FROM big_lineitem
            WHERE l_orderkey // {base_order} <> l_partkey // {base_part}
        """).fetchone()[0]
    check("guard_order_part_copy_agree", mismatched, 0)

    # guard (b): replica multiplicity — distinct keys exactly N x base
    for col_, big_t, ref_t in (("l_orderkey", "big_lineitem", "ref_lineitem"),
                               ("l_partkey", "big_lineitem", "ref_lineitem")):
        nb = con.execute(
            f"SELECT count(DISTINCT {col_}) FROM {big_t}").fetchone()[0]
        nr = con.execute(
            f"SELECT count(DISTINCT {col_}) FROM {ref_t}").fetchone()[0]
        check(f"guard_distinct_{col_}", nb, factor * nr)
    g_secs = time.time() - t0

    # base census in DuckDB over the REF tier (the id-ordered 3-way
    # orientation — different from Spark's degree orientation, so the
    # equality is also an orientation-invariance check)
    t0 = time.time()
    n_nodes, n_edges, n_wedges, n_tri = con.execute(
        """WITH li AS MATERIALIZED (
             SELECT DISTINCT l_orderkey, l_partkey FROM ref_lineitem),
           e AS MATERIALIZED (
             SELECT DISTINCT a.l_partkey AS a, b.l_partkey AS b
             FROM li a JOIN li b USING (l_orderkey)
             WHERE a.l_partkey < b.l_partkey),
           deg AS MATERIALIZED (
             SELECT v, count(*) AS d
             FROM (SELECT a AS v FROM e UNION ALL SELECT b AS v FROM e)
             GROUP BY v)
           SELECT (SELECT count(*) FROM deg),
                  (SELECT count(*) FROM e),
                  (SELECT sum(d * (d - 1) // 2) FROM deg),
                  (SELECT count(*) FROM e e1
                   JOIN e e2 ON e1.b = e2.a
                   JOIN e e3 ON e1.a = e3.a AND e2.b = e3.b)""").fetchone()
    o_secs = time.time() - t0

    # Spark's FULL census at the big tier, from the Verify dump
    dump = glob.glob(f"{dump_dir}/g_triangle_count/*.parquet")
    assert dump, f"no g_triangle_count dump under {dump_dir}"
    row = con.execute(
        f"SELECT n_nodes, n_edges, n_wedges, n_triangles "
        f"FROM read_parquet('{dump[0]}')").fetchone()
    check("census_n_nodes", row[0], factor * n_nodes)
    check("census_n_edges", row[1], factor * n_edges)
    check("census_n_wedges", row[2], factor * n_wedges)
    check("census_n_triangles", row[3], factor * n_tri)
    print(f"# guards {g_secs:.1f}s, base census {o_secs:.1f}s "
          f"(ref={ref_dir}, factor={factor})")
    sys.exit(0 if ok else 1)


if __name__ == "__main__":
    main()

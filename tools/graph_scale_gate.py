#!/usr/bin/env python3
"""Disjoint-replica SSSP gate (VERDICT r11 item 3): oracle-checks
g_sssp_hops at a tier whose graph DuckDB cannot traverse directly
(sf100: 1000x the sf0.1 bipartite customer-supplier graph, ~1.2B
edges), via the ScaleUp invariant.

ScaleUp offsets every key domain by copy * base, so the xN graph is N
DISJOINT isomorphic copies and the BFS source (the global minimum
customer node) lives in copy 0 — whose key range is UNCHANGED from the
base corpus. Therefore the hop histogram of the xN graph is EXACTLY:
    hops >= 0 rows : identical to the base histogram
    hops = -1 row  : base_unreachable + (N-1) * base_total_nodes
(the other N-1 copies are entirely unreachable from a copy-0 source).

Premise guards run ON THE BIG CORPUS inside DuckDB (all linear):
  - copy agreement: every lineitem row's order and supplier live in
    the same copy; every orders row's order and customer do too (an
    id-aliasing FK would alias into a foreign copy and connect them);
  - replica multiplicity: distinct custkey/suppkey exactly N x base;
  - the global min customer key equals the base min (source in copy 0).

Usage: python3 tools/graph_scale_gate.py <bigDir> <refDir> <factor>
         <sparkDumpDir>   # dumpDir holds g_sssp_hops/*.parquet
Dev/gate tool only — not part of the shipped library.
"""
import sys, glob, os, time

SSSP_BASE = """
WITH pairs AS MATERIALIZED (
  SELECT DISTINCT o_custkey AS c, l_suppkey AS sp
  FROM ref_orders JOIN ref_lineitem ON o_orderkey = l_orderkey),
e AS MATERIALIZED (
  SELECT c * 2 AS src, sp * 2 + 1 AS dst FROM pairs
  UNION
  SELECT sp * 2 + 1 AS src, c * 2 AS dst FROM pairs),
d0 AS MATERIALIZED (SELECT min(c) * 2 AS node, 0 AS dist FROM pairs),
d1 AS MATERIALIZED (SELECT node, min(dist) AS dist FROM (
  SELECT * FROM d0 UNION ALL
  SELECT e.dst, d0.dist + 1 FROM d0 JOIN e ON e.src = d0.node) GROUP BY node),
d2 AS MATERIALIZED (SELECT node, min(dist) AS dist FROM (
  SELECT * FROM d1 UNION ALL
  SELECT e.dst, d1.dist + 1 FROM d1 JOIN e ON e.src = d1.node) GROUP BY node),
d3 AS MATERIALIZED (SELECT node, min(dist) AS dist FROM (
  SELECT * FROM d2 UNION ALL
  SELECT e.dst, d2.dist + 1 FROM d2 JOIN e ON e.src = d2.node) GROUP BY node),
d4 AS MATERIALIZED (SELECT node, min(dist) AS dist FROM (
  SELECT * FROM d3 UNION ALL
  SELECT e.dst, d3.dist + 1 FROM d3 JOIN e ON e.src = d3.node) GROUP BY node),
nodes AS (SELECT DISTINCT node FROM (
  SELECT c * 2 AS node FROM pairs UNION ALL
  SELECT sp * 2 + 1 FROM pairs))
SELECT coalesce(d.dist, -1) AS hops, count(*) AS n
FROM nodes n LEFT JOIN d4 d USING (node)
GROUP BY 1 ORDER BY 1
"""


def views(con, d, prefix):
    for t in ("lineitem", "orders", "customer", "supplier"):
        p = f"{d}/{t}.parquet"
        src = f"'{p}/*.parquet'" if os.path.isdir(p) else f"'{p}'"
        con.execute(
            f"CREATE VIEW {prefix}{t} AS SELECT * FROM read_parquet({src})")


def main():
    big_dir, ref_dir, factor_s, dump_dir = sys.argv[1:5]
    factor = int(factor_s)
    import duckdb
    con = duckdb.connect()
    con.execute("SET temp_directory='/tmp/graph_gate_spill'")
    con.execute(f"SET memory_limit='{os.environ.get('DUCK_MEM', '48GB')}'")
    views(con, big_dir, "big_")
    views(con, ref_dir, "ref_")
    ok = True

    def check(name, got, want):
        nonlocal ok
        good = got == want
        ok = ok and good
        print(f"{name:30s} {'OK' if good else 'FAIL'}  got={got} want={want}")

    base_order = con.execute(
        "SELECT max(o_orderkey) + 1 FROM ref_orders").fetchone()[0]
    base_cust = con.execute(
        "SELECT max(c_custkey) + 1 FROM ref_customer").fetchone()[0]
    base_supp = con.execute(
        "SELECT max(s_suppkey) + 1 FROM ref_supplier").fetchone()[0]

    t0 = time.time()
    check("guard_li_order_supp_copy", con.execute(
        f"""SELECT count(*) FROM big_lineitem
            WHERE l_orderkey // {base_order} <> l_suppkey // {base_supp}
        """).fetchone()[0], 0)
    check("guard_ord_order_cust_copy", con.execute(
        f"""SELECT count(*) FROM big_orders
            WHERE o_orderkey // {base_order} <> o_custkey // {base_cust}
        """).fetchone()[0], 0)
    for col_, big_t, ref_t in (("o_custkey", "big_orders", "ref_orders"),
                               ("l_suppkey", "big_lineitem", "ref_lineitem")):
        nb = con.execute(
            f"SELECT count(DISTINCT {col_}) FROM {big_t}").fetchone()[0]
        nr = con.execute(
            f"SELECT count(DISTINCT {col_}) FROM {ref_t}").fetchone()[0]
        check(f"guard_distinct_{col_}", nb, factor * nr)
    check("guard_source_in_copy0",
          con.execute("SELECT min(o_custkey) FROM big_orders").fetchone()[0],
          con.execute("SELECT min(o_custkey) FROM ref_orders").fetchone()[0])
    g_secs = time.time() - t0

    t0 = time.time()
    base = dict(con.execute(SSSP_BASE).fetchall())
    o_secs = time.time() - t0
    base_total = sum(base.values())
    want = dict(base)
    want[-1] = base.get(-1, 0) + (factor - 1) * base_total

    dump = glob.glob(f"{dump_dir}/g_sssp_hops/*.parquet")
    assert dump, f"no g_sssp_hops dump under {dump_dir}"
    # read the WHOLE dump dir (ADVICE r12): a multi-part dump read via
    # dump[0] alone would drop histogram rows from the comparison
    got = dict(con.execute(
        "SELECT hops, n FROM read_parquet("
        f"'{dump_dir}/g_sssp_hops/*.parquet')").fetchall())
    for h in sorted(set(want) | set(got)):
        check(f"hops_{h}", got.get(h), want.get(h))
    print(f"# guards {g_secs:.1f}s, base sssp {o_secs:.1f}s "
          f"(ref={ref_dir}, factor={factor})")
    sys.exit(0 if ok else 1)


if __name__ == "__main__":
    main()

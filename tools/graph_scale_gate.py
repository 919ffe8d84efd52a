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

Round 13 adds a PAGERANK mode (VERDICT r12 item 4): the micro-rank
teleport term is a CONSTANT 150000 per node (not 1/N_total), so each
disjoint copy's ranks are EXACTLY the base graph's ranks — the xN
top-20 is therefore the top 20 of (full base ranks) x (N copies) with
node keys mapped by ScaleUp's per-domain offsets (customer node n ->
n + copy*2*base_cust; supplier node n -> n + copy*2*base_supp) and
the query's (rank DESC, node ASC) tie-break. DuckDB computes full
base ranks with the same 5-round integer unroll as the sf0.01 oracle,
expands, and the prediction must equal the Spark dump row-for-row.

Usage: python3 tools/graph_scale_gate.py <bigDir> <refDir> <factor>
         <sparkDumpDir> [mode]   # mode: sssp (default) | pagerank
         # dumpDir holds g_sssp_hops/*.parquet or g_pagerank/*.parquet
Dev/gate tool only — not part of the shipped library.
"""
import sys, glob, os, time

PAGERANK_BASE = """
WITH pairs AS MATERIALIZED (
  SELECT DISTINCT o_custkey AS c, l_suppkey AS sp
  FROM ref_orders JOIN ref_lineitem ON o_orderkey = l_orderkey),
ed AS MATERIALIZED (
  SELECT c * 2 AS src, sp * 2 + 1 AS dst FROM pairs
  UNION
  SELECT sp * 2 + 1 AS src, c * 2 AS dst FROM pairs),
od AS MATERIALIZED (SELECT src, count(*) AS od FROM ed GROUP BY 1),
e AS MATERIALIZED (SELECT ed.src, ed.dst, od.od FROM ed JOIN od ON od.src = ed.src),
r0 AS MATERIALIZED (SELECT DISTINCT src AS node, CAST(1000000 AS BIGINT) AS rank FROM ed),
r1 AS MATERIALIZED (
  SELECT e.dst AS node, 150000 + (850 * sum(r.rank // e.od)) // 1000 AS rank
  FROM e JOIN r0 r ON r.node = e.src GROUP BY e.dst),
r2 AS MATERIALIZED (
  SELECT e.dst AS node, 150000 + (850 * sum(r.rank // e.od)) // 1000 AS rank
  FROM e JOIN r1 r ON r.node = e.src GROUP BY e.dst),
r3 AS MATERIALIZED (
  SELECT e.dst AS node, 150000 + (850 * sum(r.rank // e.od)) // 1000 AS rank
  FROM e JOIN r2 r ON r.node = e.src GROUP BY e.dst),
r4 AS MATERIALIZED (
  SELECT e.dst AS node, 150000 + (850 * sum(r.rank // e.od)) // 1000 AS rank
  FROM e JOIN r3 r ON r.node = e.src GROUP BY e.dst),
r5 AS MATERIALIZED (
  SELECT e.dst AS node, 150000 + (850 * sum(r.rank // e.od)) // 1000 AS rank
  FROM e JOIN r4 r ON r.node = e.src GROUP BY e.dst)
SELECT node, CAST(rank AS BIGINT) AS rank FROM r5
"""

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
    mode = sys.argv[5] if len(sys.argv) > 5 else "sssp"
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

    if mode == "pagerank":
        # isomorphism premise: distinct purchase PAIRS exactly N x base
        # (edge structure per copy identical to the base graph)
        t0 = time.time()
        nb = con.execute("""SELECT count(*) FROM (SELECT DISTINCT
            o_custkey, l_suppkey FROM big_orders JOIN big_lineitem
            ON o_orderkey = l_orderkey)""").fetchone()[0]
        nr = con.execute("""SELECT count(*) FROM (SELECT DISTINCT
            o_custkey, l_suppkey FROM ref_orders JOIN ref_lineitem
            ON o_orderkey = l_orderkey)""").fetchone()[0]
        check("guard_distinct_pairs", nb, factor * nr)
        base_ranks = con.execute(PAGERANK_BASE).fetchall()
        con.execute("CREATE TABLE base_ranks(node BIGINT, rank BIGINT)")
        con.executemany("INSERT INTO base_ranks VALUES (?, ?)", base_ranks)
        want_rows = con.execute(f"""
            SELECT CASE WHEN node % 2 = 0
                        THEN node + copy * (2 * {base_cust})
                        ELSE node + copy * (2 * {base_supp}) END AS node,
                   rank
            FROM base_ranks CROSS JOIN (SELECT unnest(range({factor}))
                                        AS copy)
            ORDER BY rank DESC, node LIMIT 20""").fetchall()
        o_secs = time.time() - t0
        dump = glob.glob(f"{dump_dir}/g_pagerank/*.parquet")
        assert dump, f"no g_pagerank dump under {dump_dir}"
        got_rows = con.execute(
            "SELECT node, rank, is_supplier FROM read_parquet("
            f"'{dump_dir}/g_pagerank/*.parquet') "
            "ORDER BY rank DESC, node").fetchall()
        check("top20_rows", len(got_rows), 20)
        for i, (wn, wr) in enumerate(want_rows):
            g = got_rows[i] if i < len(got_rows) else None
            check(f"rank_{i}", g, (wn, wr, wn % 2 == 1))
        print(f"# guards {g_secs:.1f}s incl. pairs-multiplicity, base "
              f"pagerank+expand in guards time (ref={ref_dir}, "
              f"factor={factor})")
        sys.exit(0 if ok else 1)

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

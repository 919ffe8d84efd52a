#!/usr/bin/env python3
"""DuckDB twin of graft.imdb.ImdbScaleCensus (VERDICT r11 item 5):
recomputes every census metric of the xN IMDB pipeline run straight
from the replicated fixture FILES — train CSVs, writing JSONL, the
pandas columns-orient directing.json, the genre caches — and
equality-checks the Spark-side census parquet. All metrics are exact
integers; any join inflation, id collision, cache gap or decade-logic
drift shows up as a FAIL row.

Usage: python3 tools/imdb_scale_census.py <bigDir> <censusParquet>
Dev/gate tool only — not part of the shipped library.
"""
import sys, json, glob, os


def main():
    big_dir, census_parquet = sys.argv[1:3]
    import duckdb
    con = duckdb.connect()

    # --- fixtures -------------------------------------------------------
    con.execute(f"""
      CREATE VIEW train AS SELECT * FROM read_csv('{big_dir}/train-csv/*.csv',
        header=true, all_varchar=true,
        quote='"', escape='\\')""")
    con.execute(f"""
      CREATE VIEW test AS SELECT * FROM read_csv(
        '{big_dir}/validation_hidden-csv/*.csv', header=true, all_varchar=true,
        quote='"', escape='\\')""")
    con.execute(f"""
      CREATE VIEW writing AS SELECT * FROM read_json(
        '{big_dir}/writing-json/*.json', format='newline_delimited',
        columns={{'movie':'VARCHAR','writer':'VARCHAR'}})""")
    con.execute(f"""
      CREATE VIEW cache AS
      SELECT * FROM read_csv('{big_dir}/train_gemma3_4b_cache-csv/*.csv',
        header=true, all_varchar=true,
        quote='"', escape='\\')
      UNION ALL
      SELECT * FROM read_csv('{big_dir}/validation_gemma3_4b_cache-csv/*.csv',
        header=true, all_varchar=true,
        quote='"', escape='\\')""")
    # directing.json is the reference's pandas columns-orient single
    # object — parse in python (bounded: factor x 11k pairs), register
    d = json.load(open(f"{big_dir}/directing.json"))
    import pandas as pd
    pairs = pd.DataFrame({
        "movie": [d["movie"][k] for k in d["movie"]],
        "director": [d["director"][k] for k in d["movie"]]})
    con.register("directing", pairs)

    # --- the engineered-frame recomputation -----------------------------
    # year repair (Cleaning.repairYears) + decade (Features.withDecade);
    # top-1 entity per movie by global frequency, ties by entity asc
    # (Metadata.topEntityPerMovie); genre = warm-cache lookup
    con.execute("""
      CREATE VIEW eng AS
      WITH yrs AS (
        SELECT tconst, label,
          coalesce(TRY_CAST(startYear AS INT), TRY_CAST(endYear AS INT)) AS sy
        FROM train),
      wcnt AS (SELECT writer, count(*) AS c FROM writing GROUP BY 1),
      topw AS (
        SELECT movie, writer FROM (
          SELECT w.movie, w.writer,
                 row_number() OVER (PARTITION BY w.movie
                   ORDER BY c.c DESC, w.writer ASC) AS rn
          FROM writing w JOIN wcnt c USING (writer)) WHERE rn = 1),
      dcnt AS (SELECT director, count(*) AS c FROM directing GROUP BY 1),
      topd AS (
        SELECT movie, director FROM (
          SELECT d.movie, d.director,
                 row_number() OVER (PARTITION BY d.movie
                   ORDER BY c.c DESC, d.director ASC) AS rn
          FROM directing d JOIN dcnt c USING (director)) WHERE rn = 1)
      SELECT t.tconst, t.label,
        CASE WHEN t.sy IS NULL THEN 'unknown'
             ELSE concat(CAST((t.sy // 10) * 10 AS VARCHAR), 's') END
          AS decade,
        coalesce(w.writer, 'unknown') AS writer,
        coalesce(d.director, 'unknown') AS director,
        coalesce(NULLIF(g.genre, '\\N'), 'unknown') AS genre
      FROM yrs t
      LEFT JOIN topw w ON t.tconst = w.movie
      LEFT JOIN topd d ON t.tconst = d.movie
      LEFT JOIN cache g ON t.tconst = g.tconst""")

    want = {}
    (want["n_train"], want["writer_hits"], want["director_hits"],
     want["n_label_true"], want["card_writer"], want["card_director"],
     want["card_genre"], want["card_decade"]) = con.execute("""
      SELECT count(*),
             sum(CASE WHEN writer <> 'unknown' THEN 1 ELSE 0 END),
             sum(CASE WHEN director <> 'unknown' THEN 1 ELSE 0 END),
             sum(CASE WHEN lower(label) = 'true' THEN 1 ELSE 0 END),
             count(DISTINCT writer), count(DISTINCT director),
             count(DISTINCT genre), count(DISTINCT decade)
      FROM eng""").fetchone()
    for dec, n in con.execute(
            "SELECT decade, count(*) FROM eng GROUP BY 1").fetchall():
        want[f"decade_{dec}"] = n
    n_test = con.execute("SELECT count(*) FROM test").fetchone()[0]
    want["n_pred"] = n_test
    want["n_pred_distinct"] = n_test  # replica ids are planted-unique

    # --- compare against the Spark census -------------------------------
    # read the WHOLE dump dir (ADVICE r12): a multi-part census dump
    # read via its first part alone would drop metric rows
    src = (f"{census_parquet}/*.parquet"
           if os.path.isdir(census_parquet) else census_parquet)
    got = dict(con.execute(
        f"SELECT metric, value FROM read_parquet('{src}')").fetchall())

    ok = True
    for k in sorted(set(want) | set(got)):
        g, w = got.get(k), want.get(k)
        good = g == w and g is not None
        ok = ok and good
        print(f"{k:28s} {'OK' if good else 'FAIL'}  spark={g} duckdb={w}")
    sys.exit(0 if ok else 1)


if __name__ == "__main__":
    main()

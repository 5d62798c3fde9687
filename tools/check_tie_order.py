#!/usr/bin/env python3
"""Audit oracle ORDER BY clauses for nondeterministic tie order.

For every oracle whose SQL ends in a top-level ORDER BY, run it in
DuckDB over the given fixture and flag queries where some ORDER BY key
group contains more than one DISTINCT full row: those results are only
partially ordered, and the row-wise Spark-vs-DuckDB compare is then a
coin flip that happens to pass until a fixture regeneration reshuffles
the tie. (Full-row duplicates inside a tie group are fine — equal
tuples compare equal in any order.) Queries whose trailing ORDER BY
cannot be parsed (e.g. it belongs to a window function) are listed as
SKIP for manual review.

Usage: python3 tools/check_tie_order.py <verifyOutDir> <sfDir>
"""
import json, re, sys
import duckdb

def main(out_dir, sf_dir):
    con = duckdb.connect()
    for t in ("region nation customer supplier part orders lineitem "
              "events documents embeddings").split():
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM "
                    f"'{sf_dir}/{t}.parquet'")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    flagged, skipped, clean, noorder = 0, [], 0, []
    for name, sql in sorted(oracle.items()):
        # the trailing (outermost) ORDER BY: last occurrence, to end
        idx = sql.upper().rfind("ORDER BY")
        if idx < 0:
            noorder.append(name)
            continue
        tail = sql[idx + len("ORDER BY"):].strip()
        tail = re.sub(r"\bLIMIT\s+\d+.*$", "", tail,
                      flags=re.IGNORECASE | re.DOTALL).strip()
        cols = [re.sub(r"\s+(ASC|DESC|NULLS\s+FIRST|NULLS\s+LAST)", "",
                       c.strip(), flags=re.IGNORECASE).strip()
                for c in tail.split(",")]
        try:
            con.execute("CREATE OR REPLACE TEMP VIEW tie_r AS " + sql)
            # ordinal ORDER BY keys (ORDER BY 1, 2) would re-probe as
            # CONSTANT expressions (one all-rows tie group — a false
            # flag); resolve them to the view's column names
            vcols = [r[0] for r in con.sql(
                "DESCRIBE tie_r").fetchall()]
            cols = [vcols[int(c) - 1]
                    if re.fullmatch(r"\d+", c) and
                    0 < int(c) <= len(vcols) else c
                    for c in cols]
            collist = ", ".join(cols)
            def probe(cl):
                return con.sql(
                    "WITH d AS (SELECT DISTINCT * FROM tie_r) "
                    f"SELECT count(*) FROM (SELECT {cl} FROM d "
                    f"GROUP BY {cl} HAVING count(*) > 1)").fetchone()[0]
            try:
                bad = probe(collist)
            except Exception:
                # final ORDER BY may use CTE-qualified names (c.doc_id)
                # that the view flattens — retry unqualified
                bad = probe(", ".join(
                    re.sub(r"^\w+\.", "", c) for c in cols))
            if bad:
                print(f"TIE  {name}: {bad} underdetermined ORDER BY "
                      f"groups on ({collist})")
                flagged += 1
            else:
                clean += 1
        except Exception as e:
            skipped.append(name)
            print(f"SKIP {name}: {str(e).splitlines()[0][:120]}")
    if noorder:
        print(f"(no trailing ORDER BY — row order unchecked by the "
              f"gate's strict path or single-row: {' '.join(noorder)})")
    print(f"\n{flagged} flagged, {clean} clean, {len(skipped)} skipped, "
          f"{len(noorder)} no-order of {len(oracle)}")
    return flagged

if __name__ == "__main__":
    sys.exit(1 if main(sys.argv[1], sys.argv[2]) else 0)

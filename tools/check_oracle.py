#!/usr/bin/env python3
"""Local self-check mimicking the driver's correctness gate:
run each oracle SQL in DuckDB over the sf parquet tables, compare with the
Verify parquet dumps (columns sorted by name, rows sorted, values compared).

Usage: check_oracle.py <sfdir> <verify_outdir>
"""
import sys, json, math, glob
import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

def canon(rows, cols):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = []
    for r in rows:
        vals = []
        for i in order:
            v = r[i]
            if isinstance(v, float):
                if math.isnan(v):
                    v = "NaN"
                else:
                    v = round(v, 9)
            vals.append(v)
        out.append(tuple(vals))
    out.sort(key=lambda t: tuple(str(x) for x in t))
    return [c for c in sorted(cols)], out

def main(sfdir, outdir):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sfdir}/{t}.parquet'")
    oracle = json.load(open(f"{outdir}/oracle_sql.json"))
    results = {}
    for name, sql in sorted(oracle.items()):
        try:
            cur = con.execute(sql)
            ocols = [d[0] for d in cur.description]
            orows = cur.fetchall()
        except Exception as e:
            results[name] = f"ORACLE-ERROR: {e}"
            continue
        files = glob.glob(f"{outdir}/{name}/*.parquet")
        if not files:
            results[name] = "NO-SPARK-OUTPUT"
            continue
        cur2 = con.execute(f"SELECT * FROM '{outdir}/{name}/*.parquet'")
        scols = [d[0] for d in cur2.description]
        srows = cur2.fetchall()
        oc, orw = canon(orows, ocols)
        sc, srw = canon(srows, scols)
        if oc != sc:
            results[name] = f"SCHEMA-MISMATCH oracle={oc} spark={sc}"
        elif len(orw) != len(srw):
            results[name] = f"ROWCOUNT oracle={len(orw)} spark={len(srw)}"
        elif orw != srw:
            diffs = [(a, b) for a, b in zip(orw, srw) if a != b][:3]
            results[name] = f"VALUE-MISMATCH first_diffs={diffs}"
        else:
            results[name] = f"OK ({len(srw)} rows)"
    # queries without oracle → rows-only check
    import os
    for d in sorted(glob.glob(f"{outdir}/*/")):
        name = d.rstrip("/").split("/")[-1]
        if name not in oracle:
            try:
                n = con.execute(f"SELECT count(*) FROM '{d}*.parquet'").fetchone()[0]
                results[name] = f"ROWS-ONLY ({n} rows)"
            except Exception as e:
                results[name] = f"ROWS-ONLY-ERROR: {e}"
    ok = sum(1 for v in results.values() if v.startswith("OK"))
    for k, v in sorted(results.items()):
        flag = "  " if v.startswith(("OK", "ROWS-ONLY (")) else "XX"
        print(f"{flag} {k}: {v}")
    print(f"\n{ok}/{len(oracle)} oracle-checked OK")

if __name__ == "__main__":
    main(sys.argv[1], sys.argv[2])

#!/usr/bin/env python3
"""Local self-check mimicking the driver's correctness gate:
run each oracle SQL in DuckDB over the sf parquet tables, compare with the
Verify parquet dumps (columns sorted by name, rows sorted, values compared).

Beyond Python-value equality, this also compares the DuckDB-reported column
TYPE FAMILY of each result column: the driver hashes DuckDB-typed values, so
e.g. an oracle `sum(BIGINT)` (HUGEINT, int128) hash-mismatches a Spark
LongType column even when every value is numerically identical (this exact
class of bug shipped as claimed-green in round 7 — q_json_props). A family
mismatch is reported as a failure even when all values compare equal.

Usage: check_oracle.py <sfdir> <verify_outdir>
"""
import sys, json, math, glob, re
import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

# DuckDB type name -> family. Families model how the driver's hashing path
# (DuckDB -> arrow/pandas -> canonical string) groups types: all machine ints
# canonicalize identically, but HUGEINT and DECIMAL take different paths and
# produce different canonical values ("705" vs "705.0" / Decimal("705.00")).
def type_family(t):
    t = str(t).upper()
    if t.startswith("DECIMAL"):
        return "decimal"
    if t == "HUGEINT" or t == "UHUGEINT":
        return "hugeint"
    if t in ("TINYINT", "SMALLINT", "INTEGER", "BIGINT",
             "UTINYINT", "USMALLINT", "UINTEGER", "UBIGINT"):
        return "int"
    if t in ("FLOAT", "DOUBLE"):
        return "float"
    if re.match(r"^(VARCHAR|STRING)", t):
        return "str"
    return t  # BOOLEAN, DATE, TIMESTAMP..., lists/structs compare verbatim

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

def typed_cols(con, sql):
    """(sorted [(colname, type_family)]) for a query's result schema."""
    rel = con.sql(sql)
    pairs = sorted(zip(rel.columns, [type_family(t) for t in rel.types]))
    return pairs

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
            otypes = typed_cols(con, sql)
        except Exception as e:
            results[name] = f"ORACLE-ERROR: {e}"
            continue
        files = glob.glob(f"{outdir}/{name}/*.parquet")
        if not files:
            results[name] = "NO-SPARK-OUTPUT"
            continue
        spark_sql = f"SELECT * FROM '{outdir}/{name}/*.parquet'"
        cur2 = con.execute(spark_sql)
        scols = [d[0] for d in cur2.description]
        srows = cur2.fetchall()
        stypes = typed_cols(con, spark_sql)
        oc, orw = canon(orows, ocols)
        sc, srw = canon(srows, scols)
        if oc != sc:
            results[name] = f"SCHEMA-MISMATCH oracle={oc} spark={sc}"
        elif otypes != stypes:
            diff = [(o, s) for o, s in zip(otypes, stypes) if o != s]
            results[name] = f"TYPE-MISMATCH (driver hash WILL differ) {diff}"
        elif len(orw) != len(srw):
            results[name] = f"ROWCOUNT oracle={len(orw)} spark={len(srw)}"
        elif orw != srw:
            diffs = [(a, b) for a, b in zip(orw, srw) if a != b][:3]
            results[name] = f"VALUE-MISMATCH first_diffs={diffs}"
        else:
            results[name] = f"OK ({len(srw)} rows)"
    # queries without oracle → rows-only check
    for d in sorted(glob.glob(f"{outdir}/*/")):
        name = d.rstrip("/").split("/")[-1]
        if name not in oracle:
            try:
                n = con.execute(f"SELECT count(*) FROM '{d}*.parquet'").fetchone()[0]
                results[name] = f"ROWS-ONLY ({n} rows)"
            except Exception as e:
                results[name] = f"ROWS-ONLY-ERROR: {e}"
    ok = sum(1 for v in results.values() if v.startswith("OK"))
    bad = 0
    for k, v in sorted(results.items()):
        good = v.startswith(("OK", "ROWS-ONLY ("))
        bad += 0 if good else 1
        print(f"{'  ' if good else 'XX'} {k}: {v}")
    print(f"\n{ok}/{len(oracle)} oracle-checked OK")
    # exit non-zero on ANY XX line — including rows-only dump errors, which
    # are outside `oracle` but still mean the Verify output is broken
    return 0 if bad == 0 and ok == len(oracle) else 1

if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))

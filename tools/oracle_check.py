#!/usr/bin/env python3
"""Local replica of the driver's DuckDB-oracle correctness gate.

Usage: python3 tools/oracle_check.py <verify_out_dir> <sf_dir>

Reads each <name>/ parquet dir written by graft.Verify plus oracle_sql.json,
runs the oracle SQL in DuckDB against the sf parquet tables, and compares
row counts, sorted-by-name schemas, and value content (rows sorted, columns
sorted by name; floats compared to 6dp).
"""
import json, math, sys
import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

def norm_cell(v):
    if v is None:
        return "NULL"
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return f"{v:.6f}"
    if isinstance(v, bool):
        return str(int(v))
    return str(v)

def norm_rows(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = [tuple(norm_cell(r[i]) for i in order) for r in rows]
    out.sort()
    return [c for c in sorted(cols)], out

# Output types whose canonicalization differs between DuckDB and the driver's
# hasher even when values are equal (round-1: DECIMAL(38,6); round-4: HUGEINT
# from uncast sum(int)). Oracles must cast these away (e.g. AS BIGINT/DOUBLE).
BANNED_TYPE_PREFIXES = ("HUGEINT", "UHUGEINT", "DECIMAL")

def lint_oracle_types(con, name, sql):
    """DESCRIBE the oracle SQL and flag driver-hash-unsafe output types."""
    try:
        desc = con.execute(f"DESCRIBE {sql}").fetchall()
    except Exception as e:
        return [f"describe error: {e}"]
    return [f"{col}:{typ}" for col, typ, *_ in desc
            if any(typ.upper().startswith(p) for p in BANNED_TYPE_PREFIXES)]

def main():
    out_dir, sf_dir = sys.argv[1], sys.argv[2]
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_pass = n_fail = 0
    lint_fail = 0
    for name, sql in sorted(oracle.items()):
        bad = lint_oracle_types(con, name, sql)
        if bad:
            print(f"LINT {name}: hash-unsafe oracle output types: {bad}")
            lint_fail += 1
    for name, sql in sorted(oracle.items()):
        try:
            got = con.execute(
                f"SELECT * FROM read_parquet('{out_dir}/{name}/*.parquet')")
            got_cols = [d[0] for d in got.description]
            got_rows = got.fetchall()
        except Exception as e:
            print(f"FAIL {name}: cannot read spark output: {e}")
            n_fail += 1
            continue
        try:
            exp = con.execute(sql)
            exp_cols = [d[0] for d in exp.description]
            exp_rows = exp.fetchall()
        except Exception as e:
            print(f"FAIL {name}: oracle sql error: {e}")
            n_fail += 1
            continue
        gc, gr = norm_rows(got_cols, got_rows)
        ec, er = norm_rows(exp_cols, exp_rows)
        if gc != ec:
            print(f"FAIL {name}: schema {gc} != {ec}")
            n_fail += 1
        elif len(gr) != len(er):
            print(f"FAIL {name}: rows {len(gr)} != {len(er)}")
            n_fail += 1
        elif gr != er:
            diffs = [(a, b) for a, b in zip(gr, er) if a != b][:3]
            print(f"FAIL {name}: value mismatch, first diffs: {diffs}")
            n_fail += 1
        else:
            print(f"PASS {name} ({len(gr)} rows)")
            n_pass += 1
    # queries without oracle: rows-only
    print(f"== {n_pass} pass / {n_fail} fail / {lint_fail} type-lint ==")
    sys.exit(1 if (n_fail or lint_fail) else 0)

if __name__ == "__main__":
    main()

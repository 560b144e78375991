#!/usr/bin/env python3
"""Local replica of the driver's DuckDB-oracle correctness gate.

Usage: python3 tools/oracle_check.py <verify_out_dir> <sf_dir>
       python3 tools/oracle_check.py --reconcile <correctness.json> <registry_keys.json>

Mode 1 reads each <name>/ parquet dir written by graft.Verify plus
oracle_sql.json, runs the oracle SQL in DuckDB against the sf parquet tables,
and compares row counts, sorted-by-name schemas, and value content (rows
sorted, columns sorted by name; floats compared to 6dp). It also reconciles
against registry_keys.json (written by Verify): every registered query must
have either an output dir or an explicit verify_errors.json entry —
survivorship (round-6: 21 queries silently absent) is a failure.

Mode 2 diffs a driver CORRECTNESS_r{N}.json against the registry manifest and
fails on any unexplained absence.
"""
import json, math, os, sys
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

def load_json(path):
    with open(path) as f:
        return json.load(f)

def read_subset(out_dir):
    """The subset marker Verify writes for dev subset runs (None = full)."""
    p = os.path.join(out_dir, "subset_run.json")
    return set(load_json(p)) if os.path.exists(p) else None

def reconcile(correctness_path, keys_path):
    """Diff a correctness report's query set against the registry manifest."""
    reported = set(load_json(correctness_path))
    registry = set(load_json(keys_path))
    missing = sorted(registry - reported)
    extra = sorted(reported - registry)
    for name in missing:
        print(f"MISSING {name}: registered but absent from {correctness_path}")
    for name in extra:
        print(f"EXTRA {name}: reported but not in registry manifest")
    print(f"== reconcile: {len(registry)} registered / {len(reported)} reported"
          f" / {len(missing)} missing / {len(extra)} extra ==")
    # extras fail too: a stale/mislabeled report with phantom queries is as
    # untrustworthy as one with absences
    return len(missing) + len(extra)

def check_coverage(out_dir):
    """Every registered query must have an output dir or an explicit error.

    A dev subset run (Verify invoked with trailing query names) writes
    subset_run.json; the registry manifest stays FULL either way, so the
    reconcile here restricts itself to the subset but the run is never
    certifiable — main() forces a nonzero exit on the marker.
    """
    keys_path = os.path.join(out_dir, "registry_keys.json")
    if not os.path.exists(keys_path):
        print(f"WARN no {keys_path}; cannot reconcile against registry")
        return 0
    registry = load_json(keys_path)
    subset = read_subset(out_dir)
    if subset is not None:
        registry = [k for k in registry if k in subset]
    err_path = os.path.join(out_dir, "verify_errors.json")
    errors = load_json(err_path) if os.path.exists(err_path) else {}
    n_bad = 0
    for name in sorted(registry):
        if name in errors:
            print(f"FAIL {name}: verify error {errors[name]}")
            n_bad += 1
        elif not os.path.isdir(os.path.join(out_dir, name)):
            print(f"MISSING {name}: registered but no output dir and no error")
            n_bad += 1
    return n_bad

def main():
    if len(sys.argv) < 3 or (sys.argv[1] == "--reconcile" and len(sys.argv) < 4):
        print(__doc__)
        sys.exit(2)
    if sys.argv[1] == "--reconcile":
        sys.exit(1 if reconcile(sys.argv[2], sys.argv[3]) else 0)
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
    # survivorship guard: every registered query accounted for
    n_missing = check_coverage(out_dir)
    # queries without oracle: rows-only
    print(f"== {n_pass} pass / {n_fail} fail / {lint_fail} type-lint"
          f" / {n_missing} missing-or-errored ==")
    subset = read_subset(out_dir)
    if subset is not None:
        print(f"SUBSET RUN ({len(subset)} of registry: "
              f"{', '.join(sorted(subset))}) — dev output, NOT certifiable; "
              "re-run Verify with no query-name args for a full run")
        sys.exit(1)
    sys.exit(1 if (n_fail or lint_fail or n_missing) else 0)

if __name__ == "__main__":
    main()

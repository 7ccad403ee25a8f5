#!/usr/bin/env python3
"""Local mirror of the driver's correctness gate.

Usage: python3 tools/check.py <verify_out_dir> [sf_dir]

Runs each query's oracle SQL (from <verify_out_dir>/oracle_sql.json) in
DuckDB over the sf parquet tables, loads the Spark-written parquet result,
sorts columns by name and rows by all columns, and compares cell-by-cell.
Reports exact and approximate (1e-9 rel) float agreement separately so
ulp-level engine divergence is visible before the driver sees it.
"""
import sys, json, glob, math, os

import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def norm(rows):
    return sorted(rows, key=lambda r: tuple((x is None, str(x)) for x in r))


def main():
    out_dir = sys.argv[1]
    sf_dir = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.01"
    oracle = json.load(open(os.path.join(out_dir, "oracle_sql.json")))
    con = duckdb.connect()
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    n_pass = n_fail = n_noracle = 0
    for qdir in sorted(glob.glob(os.path.join(out_dir, "*"))):
        if not os.path.isdir(qdir):
            continue
        name = os.path.basename(qdir)
        parts = glob.glob(os.path.join(qdir, "*.parquet"))
        if not parts:
            print(f"FAIL-EMPTY {name:28s} no parquet output (query failed?)")
            n_fail += 1
            continue
        got_rel = con.sql(f"SELECT * FROM read_parquet({parts!r})")
        got_cols = sorted(got_rel.columns)
        got = norm(con.sql(
            f"SELECT {', '.join(got_cols)} FROM got_rel").fetchall())
        if name not in oracle:
            print(f"NO-ORACLE  {name:28s} rows={len(got)}")
            n_noracle += 1
            continue
        try:
            exp_rel = con.sql(oracle[name])
        except Exception as e:
            print(f"ORACLE-ERR {name:28s} {e}")
            n_fail += 1
            continue
        exp_cols = sorted(exp_rel.columns)
        exp = norm(con.sql(
            f"SELECT {', '.join(exp_cols)} FROM exp_rel").fetchall())
        if got_cols != exp_cols:
            print(f"FAIL-COLS  {name:28s} spark={got_cols} duckdb={exp_cols}")
            n_fail += 1
            continue
        # Type *families* must line up: integer widths stringify the same,
        # but a DuckDB HUGEINT (bare integer SUM) round-trips through Arrow
        # as a decimal/float and hash-mismatches against a Spark BIGINT even
        # when Python-level values compare equal (round-1 agg_conditional).
        INT_FAMILY = {"TINYINT", "SMALLINT", "INTEGER", "BIGINT",
                      "UTINYINT", "USMALLINT", "UINTEGER", "UBIGINT"}

        def family(t):
            return "INT" if t in INT_FAMILY else t
        got_types = dict(zip(got_rel.columns,
                             (family(str(t)) for t in got_rel.types)))
        exp_types = dict(zip(exp_rel.columns,
                             (family(str(t)) for t in exp_rel.types)))
        tdiff = {c: (got_types[c], exp_types[c]) for c in got_types
                 if got_types[c] != exp_types[c]}
        if tdiff:
            print(f"FAIL-TYPES {name:28s} {tdiff}")
            n_fail += 1
            continue
        if len(got) != len(exp):
            print(f"FAIL-ROWS  {name:28s} spark={len(got)} duckdb={len(exp)}")
            n_fail += 1
            continue
        exact = approx = True
        first_diff = None
        for rg, re_ in zip(got, exp):
            for cg, ce in zip(rg, re_):
                if cg == ce:
                    continue
                exact = False
                if isinstance(cg, float) and isinstance(ce, float) and \
                        math.isclose(cg, ce, rel_tol=1e-9, abs_tol=1e-12):
                    continue
                approx = False
                if first_diff is None:
                    first_diff = (cg, ce)
        if exact:
            print(f"PASS       {name:28s} rows={len(got)}")
            n_pass += 1
        elif approx:
            print(f"PASS~ULP   {name:28s} rows={len(got)} (float bits differ!)")
            n_pass += 1
        else:
            print(f"FAIL-VALS  {name:28s} e.g. spark={first_diff[0]!r} duckdb={first_diff[1]!r}")
            n_fail += 1
    print(f"== pass={n_pass} fail={n_fail} rows-only={n_noracle}")
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()

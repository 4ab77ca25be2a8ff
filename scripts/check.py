#!/usr/bin/env python3
"""Local stand-in for the driver's DuckDB-oracle compare.

Usage: python3 scripts/check.py [--lax] [--ordered] <sfDir> <verifyOutDir>

Reads each <outDir>/<name> parquet written by graft.Verify, runs the
matching oracle SQL from <outDir>/oracle_sql.json in DuckDB against the
same sf tables, and compares: row count, column names, and a hash of the
value matrix with columns sorted by name and rows sorted canonically.

STRICT float compare is the default: raw repr(), no rounding, no ±0
folding — the driver's hash is representation-sensitive, and the lax
compare once shipped 7 locally-green gates that failed the driver
(-0.0 vs 0.0 and sub-1e-9 drift are invisible to it). Pass --lax for
the old behavior (9-digit rounding, ±0 → "0") when triaging whether a
mismatch is value-level or representation-level.
"""
import json
import sys

import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings"]

STRICT = True


def norm_cell(v):
    if isinstance(v, float):
        if STRICT:
            # raw shortest-repr: distinguishes -0.0 vs 0.0 and every ulp
            return repr(v)
        # lax: guard against -0.0 vs 0.0 and tiny repr noise post-rounding
        if v == 0:
            return "0"
        return repr(round(v, 9))
    if isinstance(v, bool):
        return str(int(v))
    if isinstance(v, list):
        return "[" + ",".join(norm_cell(x) for x in v) + "]"
    return str(v)


ORDERED = False


def canon(rows, cols):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = [tuple(norm_cell(r[i]) for i in order) for r in rows]
    if not ORDERED:
        out.sort()
    return out


KNOWN_FLAGS = {"--lax", "--strict", "--ordered"}


def type_class(t):
    """Driver-hash equivalence class of a DuckDB type string.

    Empirically (CORRECTNESS_r09 vs this check): the driver's hash
    widens all <=64-bit integers to one class (9 gates ship INTEGER
    where the oracle says BIGINT and are driver-green), but HUGEINT
    (int128, what DuckDB's sum(INTEGER) returns) hashes differently
    from BIGINT even when every value is equal — exactly the 3
    driver-red/local-green gates of rounds 8-9. So: bucket the 64-bit
    integer widths together, keep everything else (HUGEINT, UHUGEINT,
    DECIMAL, FLOAT vs DOUBLE, ...) exact.
    """
    u = t.upper()
    if u in ("TINYINT", "SMALLINT", "INTEGER", "BIGINT",
             "UTINYINT", "USMALLINT", "UINTEGER"):
        return "INT64"
    return u


def coltypes(con, sql):
    """column_name -> DuckDB type class for an arbitrary SELECT."""
    return {r[0]: type_class(r[1])
            for r in con.execute(f"DESCRIBE {sql}").fetchall()}


def main():
    global STRICT, ORDERED
    flags = [a for a in sys.argv[1:] if a.startswith("--")]
    unknown = [f for f in flags if f not in KNOWN_FLAGS]
    if unknown:
        print(f"error: unknown flag(s) {unknown}; "
              f"usage: check.py [--lax] [--strict] [--ordered] "
              f"<sfDir> <verifyOutDir>")
        sys.exit(2)
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    if "--lax" in sys.argv:
        STRICT = False
    if "--strict" in sys.argv:  # accepted for explicitness; the default
        STRICT = True
    if "--ordered" in sys.argv:
        # compare rows in DELIVERED order instead of canonically sorted:
        # catches a nondeterministic ORDER BY (ties without a unique
        # tiebreak) that the sorted compare masks
        ORDERED = True
    sf_dir, out_dir = args[0], args[1]
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_pass = n_fail = n_noora = 0
    for name in sorted(oracle):
        sql = oracle[name]
        try:
            got = con.execute(
                f"SELECT * FROM '{out_dir}/{name}/*.parquet'")
            grows, gcols = got.fetchall(), [d[0] for d in got.description]
        except Exception as e:
            print(f"FAIL {name}: cannot read spark output: {e}")
            n_fail += 1
            continue
        try:
            exp = con.execute(sql)
            erows, ecols = exp.fetchall(), [d[0] for d in exp.description]
        except Exception as e:
            print(f"FAIL {name}: oracle sql error: {e}")
            n_fail += 1
            continue
        if sorted(gcols) != sorted(ecols):
            print(f"FAIL {name}: cols spark={sorted(gcols)} duck={sorted(ecols)}")
            n_fail += 1
            continue
        # Type parity: the driver's hash serializes the Arrow TYPE, not
        # just the value, so an oracle sum() leaking HUGEINT (int128)
        # against Spark's int64 fails the driver even when every value
        # matches (this shipped driver-red/local-green gates twice).
        # fetchall() erases types, so compare DESCRIBE output instead.
        try:
            gtypes = coltypes(
                con, f"SELECT * FROM '{out_dir}/{name}/*.parquet'")
            etypes = coltypes(con, f"({sql})")
        except Exception as e:
            print(f"FAIL {name}: describe error: {e}")
            n_fail += 1
            continue
        tbad = [(c, gtypes.get(c), etypes.get(c))
                for c in sorted(gcols) if gtypes.get(c) != etypes.get(c)]
        if tbad:
            print(f"FAIL {name}: type mismatch "
                  + "; ".join(f"{c}: spark={g} duck={e}"
                              for c, g, e in tbad))
            n_fail += 1
            continue
        if len(grows) != len(erows):
            print(f"FAIL {name}: rows spark={len(grows)} duck={len(erows)}")
            n_fail += 1
            continue
        g, e = canon(grows, gcols), canon(erows, ecols)
        if g != e:
            bad = next(i for i in range(len(g)) if g[i] != e[i])
            print(f"FAIL {name}: first diff row {bad}:\n  spark={g[bad]}\n  duck ={e[bad]}")
            n_fail += 1
        else:
            print(f"PASS {name} ({len(grows)} rows)")
            n_pass += 1
    # queries without oracle: rows-only
    import os
    for name in sorted(os.listdir(out_dir)):
        p = os.path.join(out_dir, name)
        if os.path.isdir(p) and name not in oracle:
            n = con.execute(f"SELECT count(*) FROM '{p}/*.parquet'").fetchone()[0]
            print(f"ROWS {name}: {n} rows (no oracle)")
            n_noora += 1
    print(f"== {n_pass} pass, {n_fail} fail, {n_noora} rows-only ==")
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()

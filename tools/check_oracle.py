#!/usr/bin/env python3
"""Local stand-in for the driver's DuckDB correctness gate.

Usage: python3 tools/check_oracle.py <sfDir> <verifyOutDir> [skip1,skip2,...]

The optional third arg names queries to SKIP (reported, not silently
dropped) — for scale runs where an oracle itself is intractable (e.g. the
edit-distance cross-pair SQL at 10x), not because the engine side is in
doubt.

Reads <verifyOutDir>/oracle_sql.json, runs each SQL in DuckDB with the
sf tables registered as views, loads the Spark parquet dump for the same
query, sorts columns by name and rows by all columns, and compares values
(exact for ints/strings, 1e-9 relative for floats — the driver hashes
bytes, so floats must effectively be bit-equal; we report near-misses
separately).

Also compares COLUMN TYPES: the driver hashes Arrow bytes, so a DuckDB
HUGEINT/DECIMAL(38,0) (from an un-cast windowed sum() or //-division)
against a Spark int64 fails the driver even when every value is equal.
A TYPE line + failure here predicts that; fix by CASTing the oracle
column (usually AS BIGINT)."""
import json, math, sys

import duckdb


def _norm_type(t):
    # physical-representation equivalence classes: TIMESTAMP and
    # TIMESTAMP WITH TIME ZONE are both int64 micros on the wire
    s = str(t).upper()
    if s.startswith("TIMESTAMP"):
        return "TIMESTAMP"
    return s


# the driver's compare tolerates integer-WIDTH differences (r08 evidence:
# q22 int32 vs BIGINT passed its hash) but NOT int-vs-decimal — so width
# mismatches warn, HUGEINT/DECIMAL-vs-int fails
_INT_WIDTHS = {"TINYINT", "SMALLINT", "INTEGER", "BIGINT",
               "UTINYINT", "USMALLINT", "UINTEGER", "UBIGINT"}


def type_mismatches(con, sql_oracle, spark_glob):
    """[(col, spark_type, oracle_type)] where physical layouts differ."""
    orel = con.sql(sql_oracle)
    otypes = {c: _norm_type(t) for c, t in zip(orel.columns, orel.types)}
    srel = con.sql(f"SELECT * FROM read_parquet('{spark_glob}')")
    stypes = {c: _norm_type(t) for c, t in zip(srel.columns, srel.types)}
    return [(c, stypes[c], otypes[c])
            for c in sorted(set(otypes) & set(stypes))
            if stypes[c] != otypes[c]]

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def sort_repr(x):
    # floats sort by a 6-sig-digit rendering so a last-ULP difference
    # between engines cannot reorder rows and defeat the near-miss path
    if isinstance(x, float):
        return f"{x:.6g}"
    return str(x)


def norm(rows, cols):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = [tuple(r[i] for i in order) for r in rows]
    out.sort(key=lambda t: tuple((x is None, sort_repr(x)) for x in t))
    return [cols[i] for i in order], out


def cmp_val(a, b):
    if a is None or b is None:
        return a is None and b is None, False
    if isinstance(a, float) or isinstance(b, float):
        try:
            fa, fb = float(a), float(b)
        except (TypeError, ValueError):
            return str(a) == str(b), False
        if fa == fb or (math.isnan(fa) and math.isnan(fb)):
            return True, False
        close = abs(fa - fb) <= 1e-9 * max(1.0, abs(fa), abs(fb))
        return False, close
    return str(a) == str(b), False


def main(sf_dir, out_dir):
    import os
    con = duckdb.connect()
    for t in TABLES:
        # driver testdata ships single-file tables; ScaleUp output is a
        # Spark-written directory of part files — accept both
        p = f"{sf_dir}/{t}.parquet"
        if os.path.isdir(p):
            p = f"{p}/*.parquet"
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    skip = set(sys.argv[3].split(",")) if len(sys.argv) > 3 else set()
    fails = []
    for name in sorted(oracle):
        if name in skip:
            print(f"SKIP {name}: oracle intractable at this scale (listed)")
            continue
        try:
            cur = con.execute(oracle[name])
            ocols = [d[0] for d in cur.description]
            orows = cur.fetchall()
            cur2 = con.execute(
                f"SELECT * FROM read_parquet('{out_dir}/{name}/*.parquet')")
            scols = [d[0] for d in cur2.description]
            srows = cur2.fetchall()
        except Exception as e:
            print(f"FAIL {name}: exec error: {e}")
            fails.append(name)
            continue
        if sorted(ocols) != sorted(scols):
            print(f"FAIL {name}: schema {sorted(scols)} vs oracle {sorted(ocols)}")
            fails.append(name)
            continue
        if len(orows) != len(srows):
            print(f"FAIL {name}: rows {len(srows)} vs oracle {len(orows)}")
            fails.append(name)
            continue
        try:
            tmis = type_mismatches(con, oracle[name],
                                   f"{out_dir}/{name}/*.parquet")
        except Exception as e:
            print(f"FAIL {name}: type check error: {e}")
            fails.append(name)
            continue
        hard = [(c, st, ot) for c, st, ot in tmis
                if not (st in _INT_WIDTHS and ot in _INT_WIDTHS)]
        for c, st, ot in tmis:
            if (c, st, ot) in hard:
                print(f"TYPE {name}: {c} spark={st} oracle={ot} "
                      f"(driver byte hash WILL differ — cast the oracle)")
            else:
                print(f"WARN {name}: {c} spark={st} oracle={ot} "
                      f"(int width only — driver tolerates, align anyway)")
        if hard:
            fails.append(name)
            continue
        _, on = norm(orows, ocols)
        _, sn = norm(srows, scols)
        bad = near = 0
        for ra, rb in zip(sn, on):
            for va, vb in zip(ra, rb):
                eq, close = cmp_val(va, vb)
                if not eq:
                    if close:
                        near += 1
                    else:
                        bad += 1
        if bad:
            print(f"FAIL {name}: {bad} value mismatches ({near} near)")
            for ra, rb in zip(sn, on):
                if ra != rb:
                    print(f"  spark:  {ra}\n  oracle: {rb}")
                    break
            fails.append(name)
        elif near:
            print(f"NEAR {name}: {near} float near-misses (driver hash may differ)")
        else:
            print(f"ok   {name} ({len(srows)} rows)")
    print(f"\n{len(oracle) - len(fails)}/{len(oracle)} green")
    return 1 if fails else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))

#!/usr/bin/env python3
"""Local stand-in for the driver's t2 correctness gate.

Usage: python3 tools/check.py <sfDir> <verifyOutDir>

Registers each testdata parquet as a DuckDB view, runs every oracle in
<verifyOutDir>/oracle_sql.json, and compares against the Spark-written
parquet in <verifyOutDir>/<name>/. Compare semantics mirror the driver:
column-name sets must match, row counts must match, then values are
compared after sorting columns by name and rows by all columns.

Exact equality is required for every cell (floats included) — queries
are designed so both engines land on bit-identical doubles.
"""
import json
import math
import sys
from pathlib import Path

import duckdb

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()

# Every oracle output column must land on one of these DuckDB types.
# Anything else — above all HUGEINT, which DuckDB silently widens
# sum(BIGINT) to — makes the driver's TYPED hash mismatch Spark's output
# even when every value is integer-equal (round-6 q_pagerank_dup).
ALLOWED_TYPES = {"BIGINT", "DOUBLE", "VARCHAR", "BOOLEAN", "DATE", "TIMESTAMP"}


def typecheck(con, sql):
    """Return [(col, type), ...] for columns outside ALLOWED_TYPES."""
    rel = con.sql(sql)
    return [(c, str(t)) for c, t in zip(rel.columns, rel.types)
            if str(t) not in ALLOWED_TYPES]


def norm(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return v
    return v


def connect(sf_dir):
    con = duckdb.connect()
    for t in TABLES:
        p = Path(sf_dir) / f"{t}.parquet"
        if p.exists():
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM parquet_scan('{p}')")
    return con


def types_only(sf_dir, out_dir):
    """Sweep ONLY oracle output types (no Spark results needed).

    Pair with `runMain graft.Verify <sf> <out> --oracles-only`, which
    dumps every oracle's SQL without executing any Spark query.
    """
    con = connect(sf_dir)
    oracles = json.loads((Path(out_dir) / "oracle_sql.json").read_text())
    n_fail = 0
    for name, sql in sorted(oracles.items()):
        try:
            bad = typecheck(con, sql)
        except Exception as e:
            bad = [("<oracle error>", str(e))]
        if bad:
            n_fail += 1
            print(f"[FAIL] {name} — {bad}")
        else:
            print(f"[PASS] {name}")
    print(f"\n{len(oracles) - n_fail} pass, {n_fail} fail")
    return 1 if n_fail else 0


def main(sf_dir, out_dir):
    con = connect(sf_dir)
    oracles = json.loads((Path(out_dir) / "oracle_sql.json").read_text())
    n_pass = n_fail = 0
    for name, sql in sorted(oracles.items()):
        spark_dir = Path(out_dir) / name
        status, detail = compare(con, sql, spark_dir)
        print(f"[{status}] {name}{(' — ' + detail) if detail else ''}")
        if status == "PASS":
            n_pass += 1
        else:
            n_fail += 1
    # queries without an oracle: rows-only check (counted like the driver's)
    for d in sorted(Path(out_dir).iterdir()):
        if d.is_dir() and d.name not in oracles:
            n = duckdb.sql(f"SELECT count(*) FROM parquet_scan('{d}/*.parquet')").fetchone()[0]
            print(f"[{'PASS' if n > 0 else 'FAIL'}] {d.name} — rows-only: {n}")
            if n > 0:
                n_pass += 1
            else:
                n_fail += 1
    print(f"\n{n_pass} pass, {n_fail} fail")
    return 1 if n_fail else 0


def compare(con, sql, spark_dir):
    try:
        bad = typecheck(con, sql)
        if bad:
            return "FAIL", f"oracle type(s) outside {sorted(ALLOWED_TYPES)}: {bad}"
        oracle = con.execute(sql)
        ocols = [d[0] for d in oracle.description]
        orows = oracle.fetchall()
    except Exception as e:
        return "FAIL", f"oracle error: {e}"
    try:
        got = con.execute(f"SELECT * FROM parquet_scan('{spark_dir}/*.parquet')")
        gcols = [d[0] for d in got.description]
        grows = got.fetchall()
    except Exception as e:
        return "FAIL", f"spark result unreadable: {e}"
    if sorted(ocols) != sorted(gcols):
        return "FAIL", f"schema: oracle={sorted(ocols)} spark={sorted(gcols)}"
    if len(orows) != len(grows):
        return "FAIL", f"rows: oracle={len(orows)} spark={len(grows)}"
    operm = sorted(range(len(ocols)), key=lambda i: ocols[i])
    gperm = sorted(range(len(gcols)), key=lambda i: gcols[i])
    okey = sorted(tuple(norm(r[i]) for i in operm) for r in orows)
    gkey = sorted(tuple(norm(r[i]) for i in gperm) for r in grows)
    for i, (a, b) in enumerate(zip(okey, gkey)):
        if a != b:
            return "FAIL", f"first diff at sorted-row {i}:\n  oracle: {a}\n  spark:  {b}"
    return "PASS", f"{len(orows)} rows"


if __name__ == "__main__":
    if len(sys.argv) < 3 or (sys.argv[1] == "--types" and len(sys.argv) < 4):
        print("usage: check.py <sfDir> <outDir> | check.py --types <sfDir> <outDir>",
              file=sys.stderr)
        sys.exit(2)
    if sys.argv[1] == "--types":
        sys.exit(types_only(sys.argv[2], sys.argv[3]))
    sys.exit(main(sys.argv[1], sys.argv[2]))

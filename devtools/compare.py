#!/usr/bin/env python3
"""Dev-only local stand-in for the driver's DuckDB correctness compare.

Usage: python3 devtools/compare.py <verify_out_dir> <sf_dir> [query ...]

Reads <verify_out_dir>/<name>/ parquet (engine result) and
<verify_out_dir>/oracle_sql.json, registers the sf parquet tables as
DuckDB views, runs each oracle, and compares rows / schema (column name
set) / values (rows sorted by all columns, columns sorted by name).
Mirrors the driver gate closely enough to iterate on oracles locally.
"""
import json
import math
import sys

import duckdb

TABLES = ("region nation customer supplier part orders lineitem "
          "events documents embeddings").split()


def canon(rows, cols):
    order = sorted(range(len(cols)), key=lambda i: cols[i])

    def cell(v):
        if v is None:
            return "\x00"
        if isinstance(v, float):
            if math.isnan(v):
                return "nan"
            return repr(v)
        if isinstance(v, (list, tuple)):
            return "[" + ",".join(cell(x) for x in v) + "]"
        if isinstance(v, bytes):
            return v.hex()
        return str(v)

    return sorted(tuple(cell(r[i]) for i in order) for r in rows)


def main():
    out_dir, sf_dir = sys.argv[1], sys.argv[2]
    only = set(sys.argv[3:])
    oracles = json.load(open(f"{out_dir}/oracle_sql.json"))
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    n_pass = n_fail = 0
    for name, sql in sorted(oracles.items()):
        if only and name not in only:
            continue
        try:
            eng = con.sql(f"SELECT * FROM '{out_dir}/{name}/*.parquet'")
            e_cols, e_rows = [d[0] for d in eng.description], eng.fetchall()
            ora = con.sql(sql)
            o_cols, o_rows = [d[0] for d in ora.description], ora.fetchall()
        except Exception as exc:
            print(f"FAIL {name}: {exc}")
            n_fail += 1
            continue
        schema_ok = sorted(e_cols) == sorted(o_cols)
        rows_ok = len(e_rows) == len(o_rows)
        vals_ok = schema_ok and rows_ok and canon(e_rows, e_cols) == canon(o_rows, o_cols)
        if vals_ok:
            print(f"PASS {name} ({len(e_rows)} rows)")
            n_pass += 1
        else:
            print(f"FAIL {name}: schema={schema_ok} ({sorted(e_cols)} vs "
                  f"{sorted(o_cols)}) rows={len(e_rows)}/{len(o_rows)}")
            if schema_ok and rows_ok:
                ce, co = canon(e_rows, e_cols), canon(o_rows, o_cols)
                diffs = [(a, b) for a, b in zip(ce, co) if a != b][:3]
                for a, b in diffs:
                    print(f"  engine: {a}\n  oracle: {b}")
            n_fail += 1
    print(f"== {n_pass} pass / {n_fail} fail ==")
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()

#!/usr/bin/env python3
"""Local pre-validation of SparkEntry.oracleSql against DuckDB, mimicking
the driver's t2 compare (driver-side tooling only — the shipped Scala
library does not use this).

Usage: oracle_check.py <sfDir> <verifyOutDir>

For each <verifyOutDir>/<name>/ parquet dir (written by graft.Verify), runs
the matching SQL from oracle_sql.json in DuckDB with the sf tables
registered as views, then compares: schema (column names, sorted), row
count, and values (columns sorted by name; exact for non-floats, exact-ish
report for floats).
"""
import json
import math
import sys
from pathlib import Path

import duckdb
import pyarrow.parquet as pq
import pyarrow as pa

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


def canon(v):
    if v is None:
        return None
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        if v == 0.0:
            return 0.0
        return v
    if isinstance(v, (list, tuple)):
        return tuple(canon(x) for x in v)
    if isinstance(v, dict):
        return tuple(sorted((k, canon(x)) for k, x in v.items()))
    return v


def type_kind(t: pa.DataType) -> str:
    """Coarse arrow-type kind: the driver's hash is type-sensitive, so a
    DuckDB HUGEINT/DECIMAL result vs a Spark BIGINT is a real mismatch
    (r8: q_doc_gate_funnel) even when the Python values compare equal."""
    if pa.types.is_integer(t):
        return "int"
    if pa.types.is_floating(t):
        return "float"
    if pa.types.is_decimal(t):
        return "decimal"
    if pa.types.is_boolean(t):
        return "bool"
    if pa.types.is_string(t) or pa.types.is_large_string(t):
        return "str"
    if pa.types.is_list(t) or pa.types.is_large_list(t):
        return "list<" + type_kind(t.value_type) + ">"
    if pa.types.is_struct(t):
        return "struct"
    if pa.types.is_timestamp(t):
        return "timestamp"
    if pa.types.is_date(t):
        return "date"
    if pa.types.is_binary(t) or pa.types.is_large_binary(t):
        return "binary"
    return str(t)


def rows_of(table: pa.Table):
    cols = sorted(table.column_names)
    data = [table.column(c).to_pylist() for c in cols]
    kinds = [type_kind(table.schema.field(c).type) for c in cols]
    return cols, kinds, [tuple(canon(col[i]) for col in data) for i in range(table.num_rows)]


def main():
    sf_dir, out_dir = Path(sys.argv[1]), Path(sys.argv[2])
    con = duckdb.connect()
    for t in TABLES:
        p = sf_dir / f"{t}.parquet"
        if p.exists():
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    oracle = json.loads((out_dir / "oracle_sql.json").read_text())
    n_pass = n_fail = n_noracle = 0
    for qdir in sorted(out_dir.iterdir()):
        if not qdir.is_dir():
            continue
        name = qdir.name
        got = pq.read_table(qdir)
        if name not in oracle:
            n_noracle += 1
            print(f"NOORACLE  {name:28s} rows={got.num_rows}"
                  + ("  !! EMPTY" if got.num_rows == 0 else ""))
            continue
        try:
            want = con.execute(oracle[name]).arrow()
        except Exception as e:
            n_fail += 1
            print(f"FAIL      {name:28s} oracle SQL error: {e}")
            continue
        gc, gk, gr = rows_of(got)
        wc, wk, wr = rows_of(want)
        if gc != wc:
            n_fail += 1
            print(f"FAIL      {name:28s} schema: spark={gc} duckdb={wc}")
            continue
        if gk != wk:
            n_fail += 1
            kd = [(c, a, b) for c, a, b in zip(gc, gk, wk) if a != b]
            print(f"FAIL      {name:28s} type kind: {kd} "
                  "(driver hash is type-sensitive — CAST the oracle)")
            continue
        if len(gr) != len(wr):
            n_fail += 1
            print(f"FAIL      {name:28s} rows: spark={len(gr)} duckdb={len(wr)}")
            continue
        # exact compare in row order first; if that fails, sorted compare
        if gr == wr:
            n_pass += 1
            print(f"PASS      {name:28s} rows={len(gr)}")
            continue
        if sorted(map(repr, gr)) == sorted(map(repr, wr)):
            n_fail += 1
            print(f"ORDER     {name:28s} values match only after row sort "
                  "(add a total ORDER BY to both sides)")
            continue
        n_fail += 1
        diffs = [(a, b) for a, b in zip(gr, wr) if a != b][:3]
        print(f"FAIL      {name:28s} value diff, first: {diffs}")
    print(f"\n{n_pass} pass, {n_fail} fail, {n_noracle} rows-only")
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()

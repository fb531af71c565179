#!/usr/bin/env python3
"""Dtype-parity audit between the engine's Verify output and the DuckDB
oracle. `tools/check.py` compares VALUES (where Python `5.0 == 5` hides an
int-vs-float divergence); the driver's hash is dtype-sensitive, so a DuckDB
HUGEINT/DOUBLE column against a Spark int64 column fails ONLY at the driver
(see COVERAGE.md round-7 note). This sweep catches that class locally.

Usage: python3 tools/audit_types.py <sfDir> <verifyOutDir> [query ...]
Exit 0 iff every oracle column's dtype class matches the engine's.
"""
import json
import sys
from pathlib import Path

import duckdb
import pyarrow.parquet as pq

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

INT = "int"
FLOAT = "float"
STR = "str"
BOOL = "bool"
TS = "ts"
DATE = "date"
BIN = "bin"
LIST = "list"
STRUCT = "struct"


def duck_class(t):
    t = t.upper()
    if t.endswith("[]") or t.startswith("LIST") or t.startswith("ARRAY"):
        return LIST
    if t.startswith("STRUCT") or t.startswith("MAP"):
        return STRUCT
    if t in ("TINYINT", "SMALLINT", "INTEGER", "BIGINT", "UTINYINT",
             "USMALLINT", "UINTEGER", "UBIGINT"):
        return INT
    if t == "HUGEINT" or t.startswith("DECIMAL"):
        # pandas turns HUGEINT/DECIMAL into float64/object -> driver-visible
        return "hugeint/decimal"
    if t in ("DOUBLE", "FLOAT", "REAL"):
        return FLOAT
    if t in ("VARCHAR", "TEXT"):
        return STR
    if t == "BOOLEAN":
        return BOOL
    if t.startswith("TIMESTAMP"):
        return TS
    if t == "DATE":
        return DATE
    if t == "BLOB":
        return BIN
    return t


def arrow_class(t):
    import pyarrow as pa
    if pa.types.is_integer(t):
        return INT
    if pa.types.is_floating(t):
        return FLOAT
    if pa.types.is_decimal(t):
        return "hugeint/decimal"
    if pa.types.is_string(t) or pa.types.is_large_string(t):
        return STR
    if pa.types.is_boolean(t):
        return BOOL
    if pa.types.is_timestamp(t):
        return TS
    if pa.types.is_date(t):
        return DATE
    if pa.types.is_binary(t) or pa.types.is_large_binary(t):
        return BIN
    if pa.types.is_list(t) or pa.types.is_large_list(t):
        return LIST
    if pa.types.is_struct(t) or pa.types.is_map(t):
        return STRUCT
    return str(t)


def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    only = set(sys.argv[3:])
    con = duckdb.connect()
    for t in TABLES:
        src = Path(sf_dir, f"{t}.parquet")
        pattern = f"{src}/*.parquet" if src.is_dir() else str(src)
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{pattern}')")
        if t == "events":
            (ts_type,) = [r[1] for r in con.execute(
                "DESCRIBE events").fetchall() if r[0] == "ts"]
            if ts_type == "BIGINT":
                con.execute("""CREATE OR REPLACE VIEW events AS
                    SELECT * REPLACE (make_timestamp(ts // 1000) AS ts)
                    FROM read_parquet('{}')""".format(pattern))
    oracle = json.loads(Path(out_dir, "oracle_sql.json").read_text())
    bad = []
    n = 0
    for name, sql in sorted(oracle.items()):
        if only and name not in only:
            continue
        qdir = Path(out_dir, name)
        if not qdir.is_dir():
            continue
        n += 1
        part = next(qdir.glob("*.parquet"), None)
        if part is None:
            bad.append((name, "<no parquet written>"))
            continue
        spark_types = {f.name: arrow_class(f.type)
                       for f in pq.read_schema(part)}
        try:
            duck_types = {r[0]: duck_class(r[1]) for r in con.execute(
                f"DESCRIBE {sql}").fetchall()}
        except Exception as e:
            bad.append((name, f"DESCRIBE failed: {e}"))
            continue
        for c in sorted(set(spark_types) | set(duck_types)):
            s, d = spark_types.get(c), duck_types.get(c)
            if s != d:
                bad.append((name, f"col `{c}`: spark={s} duckdb={d}"))
    for name, msg in bad:
        print(f"{name}: {msg}")
    print(f"\n{n - len(set(b[0] for b in bad))}/{n} dtype-clean")
    sys.exit(1 if bad else 0)


if __name__ == "__main__":
    main()

#!/usr/bin/env python3
"""Local stand-in for the driver's correctness gate: run graft.Verify output
against the DuckDB oracle and report per-query row/schema/value match.

Usage: python3 tools/check.py <sfDir> <verifyOutDir> [query ...]
"""
import json
import math
import sys
from pathlib import Path

import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def norm(v):
    if v is None:
        return "NULL"
    if isinstance(v, float):
        if math.isnan(v):
            return "NULL"  # NaN in nullable numeric columns == NULL
        return v
    if isinstance(v, bytes):
        return v.hex()
    if isinstance(v, list):
        return tuple(norm(x) for x in v)
    if isinstance(v, dict):
        return tuple(sorted((k, norm(x)) for k, x in v.items()))
    return v


def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    only = set(sys.argv[3:])
    con = duckdb.connect()
    for t in TABLES:
        # testdata ships single-file tables; Spark-written copies (e.g. the
        # ScaleUp 10x dataset) are DIRECTORIES of part files
        src = Path(sf_dir, f"{t}.parquet")
        pattern = f"{src}/*.parquet" if src.is_dir() else str(src)
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{pattern}')")
        if t == "events":
            # ScaleUp stores ts as raw NANOS BIGINT (the engine's Tables
            # normalizes on read); mirror that normalization here so the
            # oracles' CAST(ts AS TIMESTAMP) works on both layouts
            (ts_type,) = [r[1] for r in con.execute(
                "DESCRIBE events").fetchall() if r[0] == "ts"]
            if ts_type == "BIGINT":
                con.execute("""CREATE OR REPLACE VIEW events AS
                    SELECT * REPLACE (make_timestamp(ts // 1000) AS ts)
                    FROM read_parquet('{}')""".format(pattern))
    oracle = json.loads(Path(out_dir, "oracle_sql.json").read_text())
    results = {}
    for qdir in sorted(Path(out_dir).iterdir()):
        if not qdir.is_dir():
            continue
        name = qdir.name
        if only and name not in only:
            continue
        try:
            got = con.execute(
                f"SELECT * FROM read_parquet('{qdir}/*.parquet')").fetchdf()
        except Exception as e:
            results[name] = f"READ-FAIL {e}"
            continue
        if name not in oracle:
            results[name] = f"rows-only ({len(got)} rows)"
            continue
        try:
            want = con.execute(oracle[name]).fetchdf()
        except Exception as e:
            results[name] = f"ORACLE-FAIL {type(e).__name__}: {e}"
            continue
        gcols, wcols = sorted(got.columns), sorted(want.columns)
        if gcols != wcols:
            results[name] = f"SCHEMA-MISMATCH got={gcols} want={wcols}"
            continue
        if len(got) != len(want):
            results[name] = f"ROWS-MISMATCH got={len(got)} want={len(want)}"
            continue
        from collections import Counter
        # NULLs make rows unsortable (None/NaN vs values) -> multiset compare
        g = Counter(tuple(norm(v) for v in row)
                    for row in got[gcols].itertuples(index=False, name=None))
        w = Counter(tuple(norm(v) for v in row)
                    for row in want[wcols].itertuples(index=False, name=None))
        if g == w:
            results[name] = f"OK ({len(got)} rows)"
        else:
            only_g = next(iter((g - w).keys()), None)
            only_w = next(iter((w - g).keys()), None)
            results[name] = (f"VALUE-MISMATCH got-only={only_g} "
                             f"want-only={only_w} cols={gcols}")
    width = max(len(k) for k in results)
    n_ok = sum(1 for v in results.values() if v.startswith(("OK", "rows-only")))
    for k in sorted(results):
        print(f"{k:<{width}}  {results[k]}")
    print(f"\n{n_ok}/{len(results)} pass")
    sys.exit(0 if n_ok == len(results) else 1)


if __name__ == "__main__":
    main()

#!/usr/bin/env python3
"""Local stand-in for the driver's DuckDB-oracle correctness gate.

Usage: python3 tools/oracle_check.py <sfDir> <verifyOutDir>

Reads each <verifyOutDir>/<name>/ parquet result produced by
`graft.Verify`, runs the matching SQL from oracle_sql.json in DuckDB
over the same testdata tables, and compares: column names (sorted),
row counts, and values (rows sorted by all columns; floats to 1e-9
relative tolerance; timestamps normalized to microseconds).

Dev tool only — the engine itself is pure Scala/Spark.
"""
import json
import math
import sys
from pathlib import Path

import duckdb
import pandas as pd

TABLES = ["region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings"]


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    for c in df.columns:
        s = df[c]
        if pd.api.types.is_datetime64_any_dtype(s):
            df[c] = s.astype("datetime64[us]").astype("int64")
        elif s.dtype == object:
            df[c] = s.map(lambda v: str(v) if v is not None else None)
    return df.sort_values(by=list(df.columns), na_position="first").reset_index(drop=True)


def values_equal(a, b) -> bool:
    if a is None and b is None:
        return True
    if isinstance(a, float) and isinstance(b, float):
        if math.isnan(a) and math.isnan(b):
            return True
        return math.isclose(a, b, rel_tol=1e-9, abs_tol=1e-9)
    return a == b


def compare(name, spark_df, duck_df):
    sc, dc = sorted(spark_df.columns), sorted(duck_df.columns)
    if sc != dc:
        return f"SCHEMA MISMATCH spark={sc} duck={dc}"
    if len(spark_df) != len(duck_df):
        return f"ROWCOUNT MISMATCH spark={len(spark_df)} duck={len(duck_df)}"
    a, b = canon(spark_df), canon(duck_df)
    for c in a.columns:
        av, bv = a[c].tolist(), b[c].tolist()
        for i, (x, y) in enumerate(zip(av, bv)):
            x = None if (x is pd.NaT or (isinstance(x, float) and math.isnan(x))) else x
            y = None if (y is pd.NaT or (isinstance(y, float) and math.isnan(y))) else y
            if not values_equal(x, y):
                return f"VALUE MISMATCH col={c} row={i}: spark={x!r} duck={y!r}"
    return None


def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    con = duckdb.connect()
    for t in TABLES:
        # driver fixtures are single files; GenScale fixtures are Spark
        # output DIRECTORIES named <table>.parquet — glob those
        p = Path(sf_dir, f"{t}.parquet")
        src = f"{p}/*.parquet" if p.is_dir() else str(p)
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{src}')")
    oracle = json.loads(Path(out_dir, "oracle_sql.json").read_text())
    failures = 0
    for name, sql in sorted(oracle.items()):
        res_dir = Path(out_dir, name)
        if not res_dir.exists():
            print(f"FAIL {name}: no spark result dir")
            failures += 1
            continue
        try:
            spark_df = pd.read_parquet(res_dir)
        except Exception as e:
            print(f"FAIL {name}: cannot read spark result: {e}")
            failures += 1
            continue
        try:
            duck_df = con.execute(sql).fetchdf()
        except Exception as e:
            print(f"FAIL {name}: oracle SQL error: {e}")
            failures += 1
            continue
        err = compare(name, spark_df, duck_df)
        if err:
            print(f"FAIL {name}: {err}")
            failures += 1
        else:
            print(f"PASS {name} ({len(spark_df)} rows)")
    # rows-only entries (queries without oracle SQL)
    for d in sorted(Path(out_dir).iterdir()):
        if d.is_dir() and d.name not in oracle:
            try:
                n = len(pd.read_parquet(d))
                print(f"ROWS {d.name}: {n} rows (no oracle)")
            except Exception as e:
                print(f"FAIL {d.name}: rows-only read error: {e}")
                failures += 1
    print(f"\n{'ALL GREEN' if failures == 0 else f'{failures} FAILURES'}")
    sys.exit(1 if failures else 0)


if __name__ == "__main__":
    main()

#!/usr/bin/env python3
"""Local mirror of the driver's correctness gate: run Verify's parquet dumps
against the DuckDB oracle SQL and hash-compare (driver-side duckdb/pandas are
available in this container; this script is tooling, not engine code).

Usage: python3 tools/check_oracle.py <sfDir> <verifyOutDir>
"""
import json
import sys

import duckdb
import pandas as pd

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    # Normalize temporal dtypes: pd.read_parquet yields datetime.date objects
    # for DATE columns while duckdb .df() yields datetime64 Timestamps; both
    # become ISO strings so the hash compares semantically (ADVICE r01).
    for c in df.columns:
        if pd.api.types.is_datetime64_any_dtype(df[c]):
            df[c] = df[c].dt.strftime("%Y-%m-%d %H:%M:%S.%f")
        elif df[c].dtype == object and len(df) > 0:
            import datetime
            v0 = df[c].iloc[0]
            if isinstance(v0, (datetime.date, datetime.datetime)):
                df[c] = df[c].map(
                    lambda v: None if v is None else
                    (v.strftime("%Y-%m-%d %H:%M:%S.%f")
                     if isinstance(v, datetime.datetime)
                     else v.strftime("%Y-%m-%d 00:00:00.000000")))
    df = df.sort_values(by=list(df.columns), ignore_index=True)
    return df


def cell(v):
    if isinstance(v, float):
        return repr(v)          # full precision; bit-exact match required
    return str(v)


def frame_hash(df: pd.DataFrame):
    import hashlib
    h = hashlib.sha256()
    for row in df.itertuples(index=False):
        h.update("|".join(cell(v) for v in row).encode())
        h.update(b"\n")
    return h.hexdigest()


def main(sf_dir: str, out_dir: str) -> int:
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_pass = n_fail = 0
    for name, sql in sorted(oracle.items()):
        try:
            got_raw = pd.read_parquet(f"{out_dir}/{name}")
            want_raw = con.sql(sql).df()
            # Compare declared column ORDER before canon() reindexes
            # alphabetically (ADVICE r02: the sorted compare could never
            # catch an order mismatch).
            order_ok = list(got_raw.columns) == list(want_raw.columns)
            got = canon(got_raw)
            want = canon(want_raw)
        except Exception as e:
            print(f"FAIL {name}: {type(e).__name__}: {e}")
            n_fail += 1
            continue
        if not order_ok:
            # a declared-order mismatch is a FAILURE (ADVICE r03): the
            # alphabetical canon() would otherwise mask it forever
            print(f"FAIL {name}: column order differs: "
                  f"{list(got_raw.columns)} vs {list(want_raw.columns)}")
            n_fail += 1
            continue
        schema_ok = list(got.columns) == list(want.columns)
        rows_ok = len(got) == len(want)
        hash_ok = schema_ok and rows_ok and frame_hash(got) == frame_hash(want)
        if hash_ok:
            print(f"PASS {name} ({len(got)} rows)")
            n_pass += 1
        else:
            n_fail += 1
            print(f"FAIL {name}: schema_ok={schema_ok} rows {len(got)} vs "
                  f"{len(want)}")
            if schema_ok and rows_ok:
                for c in got.columns:
                    if not (got[c].map(cell) == want[c].map(cell)).all():
                        bad = (got[c].map(cell) != want[c].map(cell))
                        i = bad.idxmax()
                        print(f"  col {c}: first diff row {i}: "
                              f"{got[c][i]!r} vs {want[c][i]!r} "
                              f"({int(bad.sum())} diffs)")
            else:
                print(f"  got cols:  {list(got.columns)}")
                print(f"  want cols: {list(want.columns)}")
    print(f"== {n_pass} pass, {n_fail} fail ==")
    return 1 if n_fail else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))

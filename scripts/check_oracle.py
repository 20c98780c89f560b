"""Local emulation of the driver's correctness gate: run every queries()
entry at sf0.01 and diff against oracle_sql() via DuckDB (row count, schema,
order-insensitive values).

Usage: python scripts/check_oracle.py [sf_dir] [query ...]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb
import pandas as pd

TABLES = [
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
]


def to_pandas(res) -> pd.DataFrame:
    import pyarrow as pa

    if isinstance(res, pd.DataFrame):
        return res
    if isinstance(res, pa.Table):
        return res.to_pandas()
    return res.to_pandas()  # ray Dataset


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].astype(str)
    return df.sort_values(list(df.columns)).reset_index(drop=True)


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    import ray

    if not ray.is_initialized():
        ray.init(address="local", num_cpus=8, include_dashboard=False)

    import __ray_entry__ as mod

    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )

    queries = mod.queries()
    oracles = mod.oracle_sql()
    n_pass = n_fail = n_rows_only = 0
    for name, fn in queries.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            got = canon(to_pandas(fn(sf_dir)))
        except Exception as e:
            print(f"FAIL  {name}: engine error: {e}")
            n_fail += 1
            continue
        dt = time.time() - t0
        if name not in oracles:
            print(f"rows  {name}: {len(got)} rows ({dt:.1f}s) [no oracle]")
            n_rows_only += 1
            continue
        try:
            want = canon(con.execute(oracles[name]).fetchdf())
        except Exception as e:
            print(f"FAIL  {name}: oracle SQL error: {e}")
            n_fail += 1
            continue
        ok = len(got) == len(want)
        detail = f"rows {len(got)} vs {len(want)}"
        if ok:
            if list(got.columns) != list(want.columns):
                ok = False
                detail = f"columns {list(got.columns)} vs {list(want.columns)}"
            else:
                try:
                    import numpy as np

                    got2 = got.copy()
                    want2 = want.copy()
                    for c in got2.columns:
                        a, b = got2[c], want2[c]
                        if np.issubdtype(a.dtype, np.number) and np.issubdtype(
                            b.dtype, np.number
                        ):
                            got2[c] = a.astype(np.float64)
                            want2[c] = b.astype(np.float64)
                        elif str(a.dtype) != str(b.dtype):
                            got2[c] = a.astype(str)
                            want2[c] = b.astype(str)
                    eq = got2.equals(want2)
                    if not eq:
                        diff = (got2 != want2).any(axis=1).sum()
                        detail = f"{diff} differing rows"
                        ok = False
                except Exception as e:
                    ok = False
                    detail = f"compare error: {e}"
        if ok:
            print(f"PASS  {name}: {len(got)} rows ({dt:.1f}s)")
            n_pass += 1
        else:
            print(f"FAIL  {name}: {detail}")
            n_fail += 1
    print(f"\n{n_pass} pass, {n_fail} fail, {n_rows_only} rows-only")
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()

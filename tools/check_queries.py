"""Local stand-in for the driver's correctness gate: run every
registered query and its DuckDB oracle side-by-side and compare
row count, column set, and order-insensitive values.

Usage: python tools/check_queries.py [sf_dir] [query ...]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb
import pandas as pd

TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings"
).split()


def to_pandas(result) -> pd.DataFrame:
    import pyarrow as pa

    if isinstance(result, pd.DataFrame):
        return result
    if isinstance(result, pa.Table):
        return result.to_pandas()
    return result.to_pandas()  # ray Dataset


def normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].astype(str)
    df = df.sort_values(list(df.columns), kind="stable").reset_index(drop=True)
    return df


def compare(name: str, got: pd.DataFrame, want: pd.DataFrame) -> str | None:
    if set(got.columns) != set(want.columns):
        return f"columns: {sorted(got.columns)} vs {sorted(want.columns)}"
    if len(got) != len(want):
        return f"rows: {len(got)} vs {len(want)}"
    g, w = normalize(got), normalize(want)
    for c in g.columns:
        gs, ws = g[c], w[c]
        if pd.api.types.is_float_dtype(gs) or pd.api.types.is_float_dtype(ws):
            import numpy as np

            if not np.allclose(
                gs.astype(float), ws.astype(float), rtol=0, atol=0, equal_nan=True
            ):
                bad = (gs.astype(float) != ws.astype(float)).idxmax()
                return f"col {c} differs at {bad}: {gs[bad]} vs {ws[bad]}"
        else:
            eq = gs.astype(str).values == ws.astype(str).values
            if not eq.all():
                bad = int((~eq).argmax())
                return f"col {c} differs at {bad}: {gs.iloc[bad]!r} vs {ws.iloc[bad]!r}"
    return None


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    only = set(sys.argv[2:])

    import ray

    ray.init(
        address="local",
        num_cpus=8,
        include_dashboard=False,
        ignore_reinit_error=True,
        logging_level="ERROR",
    )
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False

    from go_data_publisher_ray.pipelines.queries import ORACLE_SQL, QUERIES

    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM parquet_scan('{sf_dir}/{t}.parquet')"
        )

    failures = []
    for name, fn in QUERIES.items():
        if only and name not in only:
            continue
        t0 = time.perf_counter()
        try:
            got = to_pandas(fn(sf_dir))
        except Exception as e:  # noqa: BLE001
            failures.append((name, f"ENGINE ERROR: {type(e).__name__}: {e}"))
            print(f"FAIL {name}: engine error {type(e).__name__}: {str(e)[:2000]}")
            continue
        t1 = time.perf_counter()
        if name not in ORACLE_SQL:
            print(f"ok   {name}: rows-only ({len(got)} rows, {t1-t0:.1f}s)")
            continue
        try:
            want = con.execute(ORACLE_SQL[name]).fetchdf()
        except Exception as e:  # noqa: BLE001
            failures.append((name, f"ORACLE ERROR: {e}"))
            print(f"FAIL {name}: oracle error {str(e)[:2000]}")
            continue
        diff = compare(name, got, want)
        if diff:
            failures.append((name, diff))
            print(f"FAIL {name}: {diff}")
        else:
            print(f"ok   {name}: {len(got)} rows match ({t1-t0:.1f}s engine)")
    ray.shutdown()
    print(f"\n{len(failures)} failures / {len(QUERIES) if not only else len(only)} queries")
    sys.exit(1 if failures else 0)


if __name__ == "__main__":
    main()

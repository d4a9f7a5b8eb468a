"""Local replica of the driver's Ray-vs-DuckDB comparison.

Used by tests/test_operators.py and runnable standalone:
``python tests/oracle_check.py [sf_dir] [query ...]``.
"""

from __future__ import annotations

import sys
from pathlib import Path

import duckdb
import numpy as np
import pandas as pd

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


def duck_con(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TABLES:
        p = Path(sf_dir) / f"{t}.parquet"
        if p.exists():
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    return con


def to_pandas(res) -> pd.DataFrame:
    import pyarrow as pa
    import ray.data

    if isinstance(res, ray.data.Dataset):
        res = res.to_pandas()
    elif isinstance(res, pa.Table):
        res = res.to_pandas()
    return res


def canonical(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].astype(str)
    return df.sort_values(list(df.columns), kind="stable").reset_index(drop=True)


def compare(ray_res, sql: str, con) -> tuple[bool, str]:
    got = canonical(to_pandas(ray_res))
    want = canonical(con.sql(sql).df())
    if list(got.columns) != list(want.columns):
        return False, f"schema mismatch: {list(got.columns)} vs {list(want.columns)}"
    if len(got) != len(want):
        return False, f"row count {len(got)} vs {len(want)}"
    for c in got.columns:
        g, w = got[c], want[c]
        if g.dtype.kind == "f" or w.dtype.kind == "f":
            ok = np.allclose(
                g.astype(float), w.astype(float), rtol=0, atol=1e-9, equal_nan=True
            )
        else:
            if g.dtype != w.dtype:
                g, w = g.astype(str), w.astype(str)
            ok = g.equals(w)
        if not ok:
            bad = (g != w) if g.dtype.kind != "f" else ~np.isclose(g.astype(float), w.astype(float), rtol=0, atol=1e-9)
            return False, f"values differ in {c}: got {g[bad].head(3).tolist()} want {w[bad].head(3).tolist()}"
    return True, "ok"


def main():
    import logging

    import ray

    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])
    ray.init(address="local", num_cpus=8, include_dashboard=False, logging_level=logging.ERROR)
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False
    sys.path.insert(0, str(Path(__file__).resolve().parent.parent))
    import __ray_entry__ as entrymod

    queries = entrymod.queries()
    oracles = entrymod.oracle_sql()
    con = duck_con(sf_dir)
    failed = []
    for name, fn in queries.items():
        if only and name not in only:
            continue
        if name not in oracles:
            try:
                res = to_pandas(fn(sf_dir))
                print(f"{name:35s} ROWS-ONLY rows={len(res)}")
            except Exception as e:  # noqa: BLE001
                print(f"{name:35s} ERROR {e}")
                failed.append(name)
            continue
        try:
            ok, msg = compare(fn(sf_dir), oracles[name], con)
        except Exception as e:  # noqa: BLE001
            ok, msg = False, f"EXCEPTION {type(e).__name__}: {e}"
        print(f"{name:35s} {'PASS' if ok else 'FAIL  ' + msg}")
        if not ok:
            failed.append(name)
    ray.shutdown()
    if failed:
        print("FAILED:", failed)
        sys.exit(1)
    print("ALL PASS")


if __name__ == "__main__":
    main()

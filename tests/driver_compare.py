"""Driver-style catalog comparison harness (see .claude/skills/verify).

Usage: python tests/driver_compare.py <sf_dir> [q1,q2,...]
Compares queries() output against oracle_sql() via DuckDB with the
same normalization the driver applies (sorted columns+rows, value
hash). Known artifact: q15/q19 flag datetime-RESOLUTION differences
the real driver tolerates.
"""
import sys, logging; sys.path.insert(0, "/root/repo")
import ray
ray.init(address="local", num_cpus=8, include_dashboard=False, logging_level=logging.ERROR)
from ray.data import DataContext
DataContext.get_current().enable_progress_bars = False
import duckdb, pandas as pd, hashlib
import __ray_entry__ as e

sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
con = duckdb.connect()
for t in "region nation customer supplier part orders lineitem events documents embeddings".split():
    con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf}/{t}.parquet')")

def norm(df):
    if not isinstance(df, pd.DataFrame): df = df.to_pandas()
    df = df[sorted(df.columns)]
    return df.sort_values(list(df.columns)).reset_index(drop=True)

def vhash(df):
    return hashlib.sha256(pd.util.hash_pandas_object(df, index=False).values.tobytes()).hexdigest()

qs, osql = e.queries(), e.oracle_sql()
names = sys.argv[2].split(",") if len(sys.argv) > 2 else sorted(qs)
for k in names:
    try:
        if k not in osql:
            res = qs[k](sf)
            n = len(res) if isinstance(res, pd.DataFrame) else getattr(res, "num_rows", None) or res.count()
            print(f"{k} rows-only rows={n}")
            continue
        mine, orc = norm(qs[k](sf)), norm(con.execute(osql[k]).df())
        ok_h = vhash(mine)==vhash(orc)
        print(k, "rows", len(mine)==len(orc), "schema", list(mine.columns)==list(orc.columns), "hash", ok_h)
        if not ok_h:
            print("  mine:", mine.head(8).to_dict("records")); print("  orc:", orc.head(8).to_dict("records"))
            print("  mine dtypes", dict(mine.dtypes.astype(str)), " orc dtypes", dict(orc.dtypes.astype(str)))
    except Exception as ex:
        print(k, "ERROR", type(ex).__name__, str(ex)[:300])
ray.shutdown()

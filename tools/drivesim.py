"""Simulate the driver's correctness gate: run each queries() entry and
its oracle_sql() side-by-side, compare rows/schema/values."""
import os
import sys
import time

import duckdb
import pandas as pd
import numpy as np

sys.path.insert(0, "/root/repo")

import ray

ray.init(address="local", num_cpus=int(__import__("os").environ.get("SIM_CPUS", "16")), include_dashboard=False,
         ignore_reinit_error=True)
from ray.data import DataContext

DataContext.get_current().enable_progress_bars = False

import __ray_entry__ as E

SF = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
ONLY = sys.argv[2].split(",") if len(sys.argv) > 2 else None

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


def to_df(res):
    import pyarrow as pa
    import ray.data as rd

    if isinstance(res, rd.Dataset):
        return res.to_pandas()
    if isinstance(res, pa.Table):
        return res.to_pandas()
    return res


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].astype(str)
    df = df.sort_values(list(df.columns)).reset_index(drop=True)
    return df


qs = E.queries()
oracles = E.oracle_sql()
results = {}
for name, fn in qs.items():
    if ONLY and name not in ONLY:
        continue
    t0 = time.time()
    try:
        mine = canon(to_df(fn(SF)))
    except Exception as ex:
        import traceback
        traceback.print_exc()
        results[name] = f"RAY-FAIL {type(ex).__name__}: {ex}"
        continue
    dt = time.time() - t0
    if name not in oracles:
        results[name] = f"rows-only rows={len(mine)} cols={list(mine.columns)} [{dt:.1f}s]"
        continue
    con = duckdb.connect()
    for t in TABLES:
        p = f"{SF}/{t}.parquet"
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")
    try:
        ref = canon(con.execute(oracles[name]).df())
    except Exception as ex:
        results[name] = f"SQL-FAIL {ex}"
        continue
    ok_rows = len(mine) == len(ref)
    ok_cols = list(mine.columns) == list(ref.columns)
    ok_vals = False
    detail = ""
    if ok_rows and ok_cols:
        if True:
            mm = mine.reset_index(drop=True)
            rr = ref.reset_index(drop=True)
            diffs = []
            for c in mm.columns:
                a, b = mm[c], rr[c]
                if a.dtype.kind == "f":
                    eq = np.isclose(a, b, rtol=0, atol=0, equal_nan=True) | (a == b)
                    eq = (a == b) | (a.isna() & b.isna())
                else:
                    eq = (a == b) | (a.isna() & b.isna())
                if not eq.all():
                    diffs.append((c, int((~eq).sum())))
            ok_vals = not diffs
            if diffs:
                detail = f" diffs={diffs}"
                for c, _ in diffs[:1]:
                    bad = (mm[c] != rr[c])
                    print(f"[{name}] first mismatches col={c}:")
                    print(pd.DataFrame({"mine": mm[c][bad], "ref": rr[c][bad]}).head(5))
    else:
        detail = f" mine_rows={len(mine)} ref_rows={len(ref)} mine_cols={list(mine.columns)} ref_cols={list(ref.columns)}"
        # dtype detail
        if ok_rows:
            detail += f" dtypes mine={dict(mine.dtypes.astype(str))} ref={dict(ref.dtypes.astype(str))}"
    status = "OK" if (ok_rows and ok_cols and ok_vals) else "MISMATCH"
    results[name] = f"{status} rows={len(mine)}{detail} [{dt:.1f}s]"

print("\n===== SUMMARY =====")
for k, v in results.items():
    print(f"{k:24s} {v}")
ray.shutdown()

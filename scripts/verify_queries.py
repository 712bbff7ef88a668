"""Local stand-in for the driver's correctness gate: run every queries()
entry and its oracle SQL side-by-side on a given sf dir, compare row count,
column names and order-insensitive values."""
import sys, os, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb
import pandas as pd

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()

def to_pandas(res):
    import ray.data
    import pyarrow as pa
    if isinstance(res, ray.data.Dataset):
        return res.to_pandas()
    if isinstance(res, pa.Table):
        return res.to_pandas()
    return res

def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)]
    df = df.astype({c: "float64" for c in df.columns if df[c].dtype.kind in "fiu"} , errors="ignore")
    return df.sort_values(by=list(df.columns)).reset_index(drop=True)

def main(sf_dir, only=None):
    import ray
    if not ray.is_initialized():
        ray.init(address="local", num_cpus=8, include_dashboard=False,
                 ignore_reinit_error=True, logging_level="ERROR")
    import __ray_entry__ as entrymod
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"create view {t} as select * from '{sf_dir}/{t}.parquet'")
    qs, oracles = entrymod.queries(), entrymod.oracle_sql()
    if only:
        unknown = sorted(set(only) - set(qs))
        if unknown:
            print(f"FAIL unknown query name(s): {', '.join(unknown)}")
            return len(unknown)        # nonzero → exit 1, like failures
        qs = {k: v for k, v in qs.items() if k in only}
    failures = 0
    for name, fn in qs.items():
        t0 = time.time()
        try:
            got = canon(to_pandas(fn(sf_dir)))
        except Exception as e:
            import traceback; traceback.print_exc()
            print(f"FAIL {name}: query raised {type(e).__name__}: {e}")
            failures += 1
            continue
        dt = time.time() - t0
        if name not in oracles:
            print(f"ok?  {name}: rows={len(got)} (rows-only, {dt:.1f}s)")
            continue
        exp = canon(con.execute(oracles[name]).df())
        if list(got.columns) != list(exp.columns):
            print(f"FAIL {name}: columns {list(got.columns)} vs {list(exp.columns)}")
            failures += 1
            continue
        if len(got) != len(exp):
            print(f"FAIL {name}: rows {len(got)} vs {len(exp)}")
            failures += 1
            continue
        try:
            pd.testing.assert_frame_equal(got, exp, check_dtype=False, check_exact=False, rtol=1e-9)
            print(f"PASS {name}: rows={len(got)} ({dt:.1f}s)")
        except AssertionError as e:
            print(f"FAIL {name}: values differ: {str(e)[:300]}")
            failures += 1
    ray.shutdown()
    return failures

if __name__ == "__main__":
    sys.exit(1 if main(sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001",
                       only=set(sys.argv[2:]) or None) else 0)

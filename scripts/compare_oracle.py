"""Dev harness mimicking the driver's correctness gate: run every
``queries()`` entry and its ``oracle_sql()`` twin on the same sf dir, compare
row-count + schema + order-insensitive values.  Usage:

    python scripts/compare_oracle.py [sf_dir] [query ...]
"""

from __future__ import annotations

import sys

import duckdb
import pandas as pd

sys.path.insert(0, ".")

TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings"
).split()


def to_pandas(obj) -> pd.DataFrame:
    import pyarrow as pa
    import ray.data as rd

    if isinstance(obj, rd.Dataset):
        return obj.to_pandas()
    if isinstance(obj, pa.Table):
        return obj.to_pandas()
    return obj


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)]
    df = df.sort_values(by=list(df.columns)).reset_index(drop=True)
    return df


def main() -> None:
    import ray

    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    only = set(sys.argv[2:])

    ray.init(address="local", num_cpus=8, include_dashboard=False, logging_level="ERROR")
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False

    import __ray_entry__ as entrymod

    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf}/{t}.parquet')"
        )

    qs, sqls = entrymod.queries(), entrymod.oracle_sql()
    failures = []
    for name, fn in qs.items():
        if only and name not in only:
            continue
        try:
            got = canon(to_pandas(fn(sf)))
        except Exception as e:
            print(f"[{name}] RAY ERROR: {type(e).__name__}: {e}")
            failures.append(name)
            continue
        if name not in sqls:
            print(f"[{name}] rows-only: {len(got)} rows, cols {list(got.columns)}")
            continue
        try:
            exp = canon(con.execute(sqls[name]).df())
        except Exception as e:
            print(f"[{name}] SQL ERROR: {type(e).__name__}: {e}")
            failures.append(name)
            continue
        ok_rows = len(got) == len(exp)
        ok_schema = list(got.columns) == list(exp.columns) and all(
            str(a) == str(b) for a, b in zip(got.dtypes, exp.dtypes)
        )
        ok_vals = ok_rows and ok_schema and got.equals(exp)
        status = "OK" if (ok_rows and ok_schema and ok_vals) else "MISMATCH"
        print(
            f"[{name}] {status} rows={len(got)}/{len(exp)} schema_ok={ok_schema} vals_ok={ok_vals}"
        )
        if status != "OK":
            failures.append(name)
            print("  ray dtypes:", dict(got.dtypes.astype(str)))
            print("  sql dtypes:", dict(exp.dtypes.astype(str)))
            if ok_schema and ok_rows:
                neq = ~(got == exp).all(axis=1)
                print("  first diffs:\n", got[neq].head(3), "\n  vs\n", exp[neq].head(3))
            else:
                print("  ray head:\n", got.head(3))
                print("  sql head:\n", exp.head(3))
    ray.shutdown()
    print("FAILURES:", failures or "none")


if __name__ == "__main__":
    main()

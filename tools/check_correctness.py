"""Local stand-in for the driver's correctness gate.

Runs every ``queries()`` entry at the given sf_dir; where an oracle SQL
exists, compares against DuckDB: row count, column names/dtypes, and an
order-insensitive value comparison (sort by all columns, exact equality).

Usage: python tools/check_correctness.py [sf_dir] [query ...]
"""

from __future__ import annotations

import sys
import time

sys.path.insert(0, "/root/repo")


def to_pandas(res):
    import pandas as pd
    import pyarrow as pa

    if isinstance(res, pa.Table):
        return res.to_pandas()
    if isinstance(res, pd.DataFrame):
        return res
    df = res.to_pandas()  # ray Dataset
    if df.empty and len(df.columns) == 0:
        try:
            sch = res.schema().base_schema  # arrow schema
            df = sch.empty_table().to_pandas()
        except Exception:
            pass
    return df


def normalize(df):
    cols = sorted(df.columns)
    df = df[cols]
    df = df.sort_values(cols, kind="mergesort").reset_index(drop=True)
    return df


def compare(name, ray_df, sql_df):
    problems = []
    if len(ray_df) != len(sql_df):
        problems.append(f"rows {len(ray_df)} vs {len(sql_df)}")
    if sorted(ray_df.columns) != sorted(sql_df.columns):
        problems.append(f"cols {sorted(ray_df.columns)} vs "
                        f"{sorted(sql_df.columns)}")
        return problems
    a, b = normalize(ray_df), normalize(sql_df)
    for c in a.columns:
        if str(a[c].dtype) != str(b[c].dtype):
            problems.append(f"dtype[{c}] {a[c].dtype} vs {b[c].dtype}")
    if len(a) == len(b):
        for c in a.columns:
            av, bv = a[c].values, b[c].values
            try:
                import numpy as np
                if a[c].dtype == object:
                    eq = (a[c].fillna("\0") == b[c].fillna("\0")).all()
                else:
                    eq = ((av == bv) | (np.asarray(
                        a[c].isna()) & np.asarray(b[c].isna()))).all()
            except Exception as e:
                problems.append(f"cmp[{c}] error {e}")
                continue
            if not eq:
                bad = (a[c].fillna(0) != b[c].fillna(0)) if a[c].dtype != object else (a[c].fillna("") != b[c].fillna(""))
                idx = list(bad[bad].index[:3])
                problems.append(
                    f"values[{c}] differ at {idx}: "
                    f"{[av[i] for i in idx]} vs {[bv[i] for i in idx]}")
    return problems


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    import duckdb
    import ray

    if not ray.is_initialized():
        ray.init(address="local", num_cpus=8, include_dashboard=False,
                 logging_level="ERROR")
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False

    import __ray_entry__ as entry

    qs = entry.queries()
    sqls = entry.oracle_sql()
    con = duckdb.connect()
    for t in ("region nation customer supplier part orders lineitem events "
              "documents embeddings").split():
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM "
                f"read_parquet('{sf_dir}/{t}.parquet')")

    n_pass = n_fail = 0
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            ray_df = to_pandas(fn(sf_dir))
        except Exception as e:
            import traceback
            traceback.print_exc()
            print(f"FAIL {name}: engine error {type(e).__name__}: {e}")
            n_fail += 1
            continue
        el = time.time() - t0
        if name in sqls:
            sql_df = con.sql(sqls[name]).df()
            problems = compare(name, ray_df, sql_df)
            if problems:
                print(f"FAIL {name} ({el:.1f}s): " + "; ".join(problems))
                n_fail += 1
            else:
                print(f"PASS {name} ({el:.1f}s, {len(ray_df)} rows)")
                n_pass += 1
        else:
            print(f"ROWS {name} ({el:.1f}s, {len(ray_df)} rows)")
            n_pass += 1
    print(f"\n{n_pass} pass, {n_fail} fail")
    ray.shutdown()
    return 1 if n_fail else 0


if __name__ == "__main__":
    raise SystemExit(main())

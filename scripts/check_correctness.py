"""Local mirror of the driver's correctness gate.

Runs every ``queries()`` entry at sf=0.01 through Ray, runs the matching
``oracle_sql()`` through DuckDB over the same parquet tables, and compares
row count, schema (column names), and order-insensitive values.

Usage: python scripts/check_correctness.py [sf_dir]
"""

from __future__ import annotations

import sys
import time

sys.path.insert(0, "/root/repo")

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def to_pandas(obj):
    import pandas as pd
    import pyarrow as pa
    import ray.data

    if isinstance(obj, ray.data.Dataset):
        return obj.to_pandas()
    if isinstance(obj, pa.Table):
        return obj.to_pandas()
    if isinstance(obj, pd.DataFrame):
        return obj
    raise TypeError(type(obj))


def canon(df):
    """Sort columns by name, rows by all columns; reset index."""
    df = df[sorted(df.columns)]
    return df.sort_values(list(df.columns), ignore_index=True)


def compare(name, ray_df, ora_df) -> list[str]:
    import numpy as np

    problems = []
    if sorted(ray_df.columns) != sorted(ora_df.columns):
        problems.append(f"schema: ray={sorted(ray_df.columns)} "
                        f"oracle={sorted(ora_df.columns)}")
        return problems
    if len(ray_df) != len(ora_df):
        problems.append(f"rows: ray={len(ray_df)} oracle={len(ora_df)}")
        return problems
    a, b = canon(ray_df), canon(ora_df)
    for col in a.columns:
        av, bv = a[col].to_numpy(), b[col].to_numpy()
        if av.dtype.kind == "f" or bv.dtype.kind == "f":
            bad = ~np.isclose(av.astype(float), bv.astype(float),
                              rtol=0, atol=0, equal_nan=True)
            if bad.any():
                close = np.isclose(av.astype(float), bv.astype(float),
                                   rtol=1e-12, equal_nan=True)
                tag = ("float-EXACT-mismatch-but-close" if close.all()
                       else "float-mismatch")
                problems.append(
                    f"{col}: {tag} n={int(bad.sum())} "
                    f"e.g. {av[bad][:3]} vs {bv[bad][:3]}")
        else:
            bad = av != bv
            if bad.any():
                problems.append(f"{col}: {int(bad.sum())} mismatches "
                                f"e.g. {av[bad][:3]} vs {bv[bad][:3]}")
    return problems


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = sys.argv[2:] or None

    import duckdb
    import ray
    from ray.data import DataContext

    if not ray.is_initialized():
        ray.init(address="local", num_cpus=8, include_dashboard=False,
                 logging_level="ERROR")
    DataContext.get_current().enable_progress_bars = False
    import logging
    logging.getLogger("ray.data").setLevel(logging.ERROR)

    import __ray_entry__ as e

    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM "
                    f"read_parquet('{sf_dir}/{t}.parquet')")

    qs, oracles = e.queries(), e.oracle_sql()
    n_fail = 0
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            ray_df = to_pandas(fn(sf_dir))
        except Exception as ex:
            print(f"FAIL {name}: ray error: {ex!r}")
            n_fail += 1
            continue
        t_ray = time.time() - t0
        if name not in oracles:
            print(f"ok   {name}: rows={len(ray_df)} [no oracle] "
                  f"({t_ray:.1f}s)")
            continue
        t0 = time.time()
        ora_df = con.execute(oracles[name]).df()
        t_ora = time.time() - t0
        problems = compare(name, ray_df, ora_df)
        if problems:
            n_fail += 1
            print(f"FAIL {name} ({t_ray:.1f}s ray / {t_ora:.1f}s duckdb):")
            for p in problems:
                print(f"     {p}")
        else:
            print(f"ok   {name}: rows={len(ray_df)} "
                  f"({t_ray:.1f}s ray / {t_ora:.1f}s duckdb)")
    ray.shutdown()
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()

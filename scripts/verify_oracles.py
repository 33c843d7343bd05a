"""Driver-mimic: run every queries() entry and its oracle_sql() side by side
and compare row count, sorted-column names, and order-insensitive value
hashes. Usage: python scripts/verify_oracles.py [sf_dir]
"""

from __future__ import annotations

import hashlib
import sys

import duckdb
import pandas as pd

sys.path.insert(0, "/root/repo")

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


def norm(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if pd.api.types.is_datetime64_any_dtype(df[c]):
            df[c] = df[c].astype("datetime64[us]")
        elif pd.api.types.is_float_dtype(df[c]):
            df[c] = df[c].round(9)
        elif pd.api.types.is_integer_dtype(df[c]):
            df[c] = df[c].astype("int64")
    df = df.sort_values(list(df.columns), kind="stable").reset_index(drop=True)
    return df


def value_hash(df: pd.DataFrame) -> str:
    return hashlib.sha256(
        df.to_csv(index=False, float_format="%.9g").encode()
    ).hexdigest()[:16]


def main(sf_dir: str, only: list[str]):
    import ray

    ray.init(address="local", num_cpus=8, include_dashboard=False,
             ignore_reinit_error=True, logging_level="ERROR")
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False

    import __ray_entry__ as e

    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")

    qs, os_ = e.queries(), e.oracle_sql()
    fails = 0
    for name, fn in qs.items():
        if only and name not in only:
            continue
        res = fn(sf_dir)
        if hasattr(res, "to_pandas"):
            df = res.to_pandas()
        else:
            df = pd.DataFrame(res)
        sql = os_.get(name)
        if sql is None:
            print(f"{name}: rows={len(df)} (rows-only, no oracle)")
            continue
        odf = con.sql(sql).df()
        a, b = norm(df), norm(odf)
        ok_rows = len(a) == len(b)
        ok_cols = list(a.columns) == list(b.columns)
        ha, hb = value_hash(a), value_hash(b)
        ok = ok_rows and ok_cols and ha == hb
        print(f"{name}: rows {len(a)}/{len(b)} cols_ok={ok_cols} hash {ha}/{hb} -> {'OK' if ok else 'FAIL'}")
        if not ok:
            fails += 1
            if not ok_cols:
                print("  ray cols:", list(a.columns))
                print("  sql cols:", list(b.columns))
            elif ok_rows:
                neq = (a != b) & ~(a.isna() & b.isna())
                bad_cols = [c for c in a.columns if neq[c].any()]
                print("  differing cols:", bad_cols[:5])
                for c in bad_cols[:2]:
                    i = neq[c].idxmax()
                    print(f"   {c}[{i}]: ray={a[c][i]!r} sql={b[c][i]!r}")
    ray.shutdown()
    sys.exit(1 if fails else 0)


if __name__ == "__main__":
    args = sys.argv[1:]
    sf = args[0] if args and not args[0].startswith("-") else "/root/testdata/sf0.01"
    only = [a for a in args[1:]]
    main(sf, only)

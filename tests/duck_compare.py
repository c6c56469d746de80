"""Driver-style Spark-vs-DuckDB comparison helper (shared by tests & dev)."""

from __future__ import annotations

import math

import duckdb
import pandas as pd

TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


def duck_run(sql: str, sf_dir: str) -> pd.DataFrame:
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )
    try:
        return con.execute(sql).fetchdf()
    finally:
        con.close()


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        s = df[c]
        if pd.api.types.is_bool_dtype(s):
            df[c] = s.astype("boolean")
        elif pd.api.types.is_float_dtype(s):
            df[c] = s.astype("float64")
        elif pd.api.types.is_integer_dtype(s):
            df[c] = s.astype("Int64")
        elif pd.api.types.is_datetime64_any_dtype(s):
            df[c] = pd.to_datetime(s).astype("datetime64[us]")
        elif s.dtype == object:
            # decimals and other exotic scalars → canonical string/float
            def _cv(v):
                if v is None:
                    return None
                if isinstance(v, float):
                    return v
                try:
                    import decimal

                    if isinstance(v, decimal.Decimal):
                        return float(v)
                except ImportError:  # pragma: no cover
                    pass
                return v
            df[c] = s.map(_cv)
    return df.sort_values(list(df.columns), ignore_index=True, na_position="first")


def compare(spark_df: pd.DataFrame, duck_df: pd.DataFrame, float_exact: bool = True):
    """Return (ok, msg). Mirrors the driver: row count, column names,
    value equality after column-name sort + row sort."""
    a, b = canon(spark_df), canon(duck_df)
    if list(a.columns) != list(b.columns):
        return False, f"columns differ: {list(a.columns)} vs {list(b.columns)}"
    if len(a) != len(b):
        return False, f"row count {len(a)} vs {len(b)}"
    for c in a.columns:
        av, bv = a[c], b[c]
        if pd.api.types.is_float_dtype(av) or pd.api.types.is_float_dtype(bv):
            av = av.astype("float64")
            bv = bv.astype("float64")
            both_nan = av.isna() & bv.isna()
            if float_exact:
                eq = (av == bv) | both_nan
            else:
                eq = both_nan | av.combine(
                    bv, lambda x, y: (
                        (isinstance(x, float) and isinstance(y, float))
                        and (math.isclose(x, y, rel_tol=1e-9, abs_tol=1e-9))
                    )
                )
            if not eq.all():
                i = (~eq).idxmax()
                return False, f"col {c} row {i}: {av[i]!r} vs {bv[i]!r}"
        else:
            an = av.isna()
            bn = bv.isna()
            eq = (an & bn) | (av.astype(str) == bv.astype(str))
            if not eq.all():
                i = (~eq).idxmax()
                return False, f"col {c} row {i}: {av[i]!r} vs {bv[i]!r}"
    return True, "ok"

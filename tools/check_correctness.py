"""Local stand-in for the driver's correctness gate: run each
queries()[name] on Spark and oracle_sql()[name] on DuckDB over the
same sf dir, compare row count + column names + order-insensitive
values. Usage: python tools/check_correctness.py [sf_dir] [names...]

REQUIRED PER-ROUND GATE (no names = all queries): the driver stamps
only the first 50 registry names each round, so the full sweep here
is what keeps the rotated-to-the-back queries value-checked every
round — run it green before shipping a round."""

from __future__ import annotations

import os
import sys

import duckdb
import numpy as np
import pandas as pd

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def _normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        s = df[c]
        if pd.api.types.is_datetime64_any_dtype(s):
            df[c] = s.astype("datetime64[us]").astype(str)
        elif pd.api.types.is_float_dtype(s):
            df[c] = s.round(9)
        elif pd.api.types.is_bool_dtype(s):
            df[c] = s.astype(bool)
        elif s.dtype == object:
            df[c] = s.astype(str)
        else:
            try:
                df[c] = s.astype("int64")
            except (TypeError, ValueError):
                df[c] = s.astype(str)
    return df.sort_values(list(df.columns), kind="stable").reset_index(drop=True)


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    import __spark_entry__ as entrymod
    from pdfextraction_spark.session import build_session

    spark = build_session("correctness-check", master="local[8]",
                          shuffle_partitions=8)
    con = duckdb.connect()
    for t in TABLES:
        p = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")

    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    failures = []
    for name, fn in qs.items():
        if only and name not in only:
            continue
        try:
            got = fn(spark, sf_dir).toPandas()
        except Exception as e:  # noqa: BLE001
            print(f"[FAIL] {name}: spark error: {e}")
            failures.append(name)
            continue
        if name not in oracles:
            print(f"[rows-only] {name}: {len(got)} rows, "
                  f"cols={sorted(got.columns)}")
            continue
        try:
            exp = con.execute(oracles[name]).df()
        except Exception as e:  # noqa: BLE001
            print(f"[FAIL] {name}: duckdb error: {e}")
            failures.append(name)
            continue
        for c in sorted(set(got.columns) & set(exp.columns)):
            if str(got[c].dtype) != str(exp[c].dtype):
                print(f"[warn] {name}.{c}: spark dtype {got[c].dtype} "
                      f"!= duckdb dtype {exp[c].dtype}")
        g, e = _normalize(got), _normalize(exp)
        if list(g.columns) != list(e.columns):
            print(f"[FAIL] {name}: columns {list(g.columns)} != {list(e.columns)}")
            failures.append(name)
            continue
        if len(g) != len(e):
            print(f"[FAIL] {name}: rows {len(g)} != {len(e)}")
            failures.append(name)
            continue
        if not g.equals(e):
            neq = (g != e) & ~(g.isna() & e.isna())
            bad_cols = [c for c in g.columns if neq[c].any()]
            print(f"[FAIL] {name}: value mismatch in {bad_cols}")
            for c in bad_cols[:2]:
                i = int(np.flatnonzero(neq[c].to_numpy())[0])
                print(f"    {c}[{i}]: spark={g[c].iloc[i]!r} duckdb={e[c].iloc[i]!r}")
            failures.append(name)
            continue
        print(f"[OK]   {name}: {len(g)} rows")
    spark.stop()
    if failures:
        print("FAILURES:", failures)
        return 1
    print("all checks passed")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())

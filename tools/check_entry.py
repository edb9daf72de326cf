"""Driver-compare harness: runs every __spark_entry__.queries() entry and
its oracle_sql() DuckDB twin on the same sf dir, and reports row-count /
column / value mismatches (the same comparison shape the driver uses).

Usage: python tools/check_entry.py [sf_dir] [query ...]
"""

from __future__ import annotations

import os
import sys

import duckdb
import numpy as np
import pandas as pd

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


def duck_con(sf_dir: str):
    con = duckdb.connect()
    for t in TABLES:
        p = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    return con


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if pd.api.types.is_datetime64_any_dtype(df[c]):
            df[c] = df[c].astype("datetime64[us]")
        elif pd.api.types.is_float_dtype(df[c]):
            df[c] = df[c].astype("float64")
        elif pd.api.types.is_integer_dtype(df[c]):
            df[c] = df[c].astype("int64")
    return df.sort_values(list(df.columns)).reset_index(drop=True)


def driver_traps(pdf: pd.DataFrame) -> list[str]:
    """Checks the real driver enforces but canon() would hide: object cells
    holding lists/ndarrays crash its canonicalizer (unhashable type)."""
    out = []
    for c in pdf.columns:
        if pdf[c].dtype == object and len(pdf) and isinstance(
            pdf[c].iloc[0], (list, tuple, np.ndarray, dict)
        ):
            out.append(f"col {c}: non-scalar cells ({type(pdf[c].iloc[0]).__name__}) — driver canonicalizer crashes on these")
    return out


def compare(name: str, spark_pdf: pd.DataFrame, duck_pdf: pd.DataFrame) -> list[str]:
    problems = []
    # driver hashes raw dtypes: DuckDB HUGEINT sums arrive float64 while
    # Spark bigint arrives int64 — flag any int/float family mismatch
    for c in set(spark_pdf.columns) & set(duck_pdf.columns):
        s_int = pd.api.types.is_integer_dtype(spark_pdf[c])
        d_int = pd.api.types.is_integer_dtype(duck_pdf[c])
        s_f = pd.api.types.is_float_dtype(spark_pdf[c])
        d_f = pd.api.types.is_float_dtype(duck_pdf[c])
        if (s_int and d_f) or (s_f and d_int):
            problems.append(
                f"col {c}: dtype family mismatch spark={spark_pdf[c].dtype} duck={duck_pdf[c].dtype}"
                " (driver hash would mismatch — ::BIGINT-cast integer sums in the oracle)"
            )
    if sorted(spark_pdf.columns) != sorted(duck_pdf.columns):
        problems.append(f"columns differ: spark={sorted(spark_pdf.columns)} duck={sorted(duck_pdf.columns)}")
        return problems
    if len(spark_pdf) != len(duck_pdf):
        problems.append(f"row count differs: spark={len(spark_pdf)} duck={len(duck_pdf)}")
    a, b = canon(spark_pdf), canon(duck_pdf)
    if len(a) == len(b):
        for c in a.columns:
            av, bv = a[c], b[c]
            if pd.api.types.is_float_dtype(av):
                eq = np.isclose(av.to_numpy(), bv.to_numpy(), rtol=0, atol=0, equal_nan=True)
                exact = (av.to_numpy() == bv.to_numpy()) | (av.isna().to_numpy() & bv.isna().to_numpy())
                if not exact.all():
                    n_bad = int((~exact).sum())
                    i = int(np.argmax(~exact))
                    problems.append(
                        f"col {c}: {n_bad} value diffs (hash would mismatch), e.g. row {i}: "
                        f"spark={av.iloc[i]!r} duck={bv.iloc[i]!r}"
                    )
            else:
                eq = (av == bv) | (av.isna() & bv.isna())
                if not eq.all():
                    n_bad = int((~eq).sum())
                    i = int(np.argmax(~eq.to_numpy()))
                    problems.append(
                        f"col {c}: {n_bad} diffs, e.g. row {i}: spark={av.iloc[i]!r} duck={bv.iloc[i]!r}"
                    )
    return problems


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    only = set(sys.argv[2:])

    import __spark_entry__ as E
    from miru_spark.session import get_spark

    spark = get_spark("check_entry", cores=8, shuffle_partitions=8)
    con = duck_con(sf_dir)
    qs, oracles = E.queries(), E.oracle_sql()

    extra_oracles = set(oracles) - set(qs)
    if extra_oracles:
        print(f"FATAL: oracle_sql keys not in queries(): {extra_oracles}")
        return 1

    failed = []
    import time

    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.monotonic()
        try:
            spark_pdf = fn(spark, sf_dir).toPandas()
        except Exception as e:  # noqa: BLE001
            failed.append(name)
            print(f"[FAIL] {name}: spark raised {type(e).__name__}: {e}")
            continue
        traps = driver_traps(spark_pdf)
        if traps:
            failed.append(name)
            print(f"[FAIL] {name}:")
            for p in traps:
                print(f"    {p}")
            continue
        if name not in oracles:
            print(f"[rows-only] {name}: {len(spark_pdf)} rows ({time.monotonic()-t0:.1f}s)")
            continue
        try:
            duck_pdf = con.sql(oracles[name]).df()
        except Exception as e:  # noqa: BLE001
            failed.append(name)
            print(f"[FAIL] {name}: duckdb raised {type(e).__name__}: {e}")
            continue
        problems = compare(name, spark_pdf, duck_pdf)
        if problems:
            failed.append(name)
            print(f"[FAIL] {name} ({len(spark_pdf)} vs {len(duck_pdf)} rows):")
            for p in problems:
                print(f"    {p}")
        else:
            print(f"[ok] {name}: {len(spark_pdf)} rows match ({time.monotonic()-t0:.1f}s)")

    print(f"\n{'FAILED: ' + ', '.join(failed) if failed else 'ALL MATCH'}")
    return 1 if failed else 0


if __name__ == "__main__":
    sys.exit(main())

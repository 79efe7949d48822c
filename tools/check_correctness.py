"""Local replica of the driver's t2 correctness gate.

Runs each __spark_entry__.queries() entry on Spark and its oracle_sql() on
DuckDB (views pre-registered over the same parquet), then compares
row-count + column set + order-insensitive values. Usage:

    python tools/check_correctness.py [--exact] [sf_dir] [only_query ...]

--exact compares float columns bit-for-bit (the driver hashes exact
values; the default atol=1e-9 comparator is looser than the real gate).
Per-query spark/oracle wall seconds are always printed so slow oracles
are visible (the round-2 driver run dropped the tail of the query dict,
most plausibly on a time cap).
"""

from __future__ import annotations

import sys
import time
import warnings

import duckdb
import numpy as np
import pandas as pd

# pandas fillna-downcasting chatter drowns the per-query verdict lines
warnings.filterwarnings("ignore", category=FutureWarning)

sys.path.insert(0, ".")

EXACT = "--exact" in sys.argv
if EXACT:
    sys.argv.remove("--exact")

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].map(lambda v: None if v is None or (isinstance(v, float) and np.isnan(v)) else v)
    return df.sort_values(list(df.columns), na_position="first").reset_index(drop=True)


def compare(name: str, sdf: pd.DataFrame, odf: pd.DataFrame) -> list[str]:
    problems = []
    if len(sdf) != len(odf):
        problems.append(f"rowcount spark={len(sdf)} oracle={len(odf)}")
    if sorted(sdf.columns) != sorted(odf.columns):
        problems.append(f"columns spark={sorted(sdf.columns)} oracle={sorted(odf.columns)}")
        return problems
    s, o = canon(sdf), canon(odf)
    if len(s) != len(o):
        return problems
    for c in s.columns:
        sv, ov = s[c], o[c]
        if EXACT and sv.dtype.kind != ov.dtype.kind:
            # the driver's value hash is dtype-sensitive: DuckDB SUM(int)
            # returns HUGEINT which pandas fetches as float64 while the
            # Spark long stays int64 — equal values, red hash.  The r04
            # reds (summaries/variance_report/verify_report) all had
            # naked integer SUMs in their oracles; surface the class
            # loudly so it can't ship again.
            problems.append(
                f"col {c}: dtype kind mismatch spark={sv.dtype} "
                f"oracle={ov.dtype} (driver hash is dtype-sensitive; "
                f"CAST integer SUMs back to BIGINT in the oracle)")
        if sv.dtype.kind == "f" or ov.dtype.kind == "f":
            sv = pd.to_numeric(sv, errors="coerce")
            ov = pd.to_numeric(ov, errors="coerce")
            if EXACT:
                # driver-style: exact bit equality (NaN==NaN, -0.0 != 0.0)
                sb = np.asarray(sv, dtype=np.float64).view(np.int64)
                ob = np.asarray(ov, dtype=np.float64).view(np.int64)
                nan = np.isnan(np.asarray(sv)) & np.isnan(np.asarray(ov))
                bad = (sb != ob) & ~nan
            else:
                bad = ~(np.isclose(sv.fillna(np.nan), ov.fillna(np.nan),
                                   rtol=0, atol=1e-9, equal_nan=True))
        else:
            bad = ~(sv.astype(object).fillna("\x00N") == ov.astype(object).fillna("\x00N"))
        n_bad = int(np.asarray(bad).sum())
        if n_bad:
            i = int(np.argmax(np.asarray(bad)))
            problems.append(
                f"col {c}: {n_bad} mismatches; first at row {i}: "
                f"spark={s[c].iloc[i]!r} oracle={o[c].iloc[i]!r}")
    return problems


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    import __spark_entry__ as entry
    from pdf_extraction_spark.session import get_spark

    spark = get_spark(app_name="correctness-check", cores=8, shuffle_partitions=8)
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")

    qs, oracles = entry.queries(), entry.oracle_sql()
    failed = []
    n_run = 0
    t_total0 = time.monotonic()
    for name, fn in qs.items():
        if only and name not in only:
            continue
        n_run += 1
        t0 = time.monotonic()
        try:
            sdf = fn(spark, sf_dir).toPandas()
        except Exception as e:  # noqa: BLE001
            print(f"[FAIL] {name}: spark error: {e}")
            failed.append(name)
            continue
        t_spark = time.monotonic() - t0
        if name not in oracles:
            print(f"[rows-only] {name}: {len(sdf)} rows  "
                  f"(spark {t_spark:.1f}s)")
            continue
        t0 = time.monotonic()
        try:
            odf = con.sql(oracles[name]).df()
        except Exception as e:  # noqa: BLE001
            print(f"[FAIL] {name}: oracle error: {e}")
            failed.append(name)
            continue
        t_oracle = time.monotonic() - t0
        problems = compare(name, sdf, odf)
        if problems:
            print(f"[FAIL] {name}:  (spark {t_spark:.1f}s oracle "
                  f"{t_oracle:.1f}s)")
            for p in problems:
                print(f"    {p}")
            failed.append(name)
        else:
            print(f"[OK]   {name}: {len(sdf)} rows match  "
                  f"(spark {t_spark:.1f}s oracle {t_oracle:.1f}s)")
    print(f"\n{n_run - len(failed)}/{n_run} queries pass"
          + (f" (of {len(qs)} registered)" if n_run != len(qs) else "")
          + f"  (total {time.monotonic() - t_total0:.0f}s, "
          f"{'exact' if EXACT else 'atol=1e-9'} float compare)")
    return 1 if failed else 0


if __name__ == "__main__":
    sys.exit(main())

#!/usr/bin/env python3
"""Local stand-in for the driver's t2 correctness gate.

Usage: python3 tools/compare.py <sfDir> <verifyOutDir> [query ...]

Mimics the DRIVER's comparator, not DuckDB's canonicalization:
  - Spark side is read with pyarrow -> pandas (physical parquet types
    survive: decimal128 stays Decimal, lists stay ndarray/list).
  - Oracle side is the DuckDB result fetched as a pandas frame.
  - Columns sorted by name; dtype mismatch is a FAILURE (round-1 lesson:
    DECIMAL/HUGEINT/int64-vs-float64 differences merge red at the driver).
  - Any non-scalar cell (list/dict/ndarray/Decimal) is a FAILURE — the
    driver's sort_values throws on them (lexsort_indexer).
  - Values compared row-ordered (every query ORDER BYs a total key).
"""
import decimal
import json
import math
import sys

import duckdb
import numpy as np
import pandas as pd
import pyarrow.dataset as pads

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

SCALAR_OK = (str, bytes, bool, int, float, np.bool_, np.integer,
             np.floating, pd.Timestamp, type(None))


def bad_cell(v):
    if isinstance(v, SCALAR_OK):
        return None
    if isinstance(v, (list, tuple, dict, set, np.ndarray)):
        return f"non-scalar {type(v).__name__}"
    if isinstance(v, decimal.Decimal):
        return "decimal.Decimal (DECIMAL output column)"
    if v is pd.NaT or pd.isna(v):
        return None
    return f"unhashable {type(v).__name__}"


def canon(v):
    if v is None or (isinstance(v, float) and math.isnan(v)):
        return "<null>"
    try:
        if pd.isna(v):
            return "<null>"
    except (TypeError, ValueError):
        pass
    if isinstance(v, (float, np.floating)):
        return repr(float(v))
    if isinstance(v, (bool, np.bool_)):
        return str(bool(v))
    if isinstance(v, np.integer):
        return str(int(v))
    return str(v)


def norm_dates(df):
    # parquet date32 -> pandas object-of-datetime.date; DuckDB DATE ->
    # datetime64[us]. The driver compares these green (its DuckDB fetch
    # also yields datetime.date), so normalize instead of flagging.
    for c in df.columns:
        if str(df[c].dtype) == "object" and len(df):
            v = df[c].dropna()
            if len(v) and type(v.iloc[0]).__name__ == "date":
                df[c] = pd.to_datetime(df[c])
    return df


def check(name, sdf, odf):
    sdf = norm_dates(sdf.reindex(sorted(sdf.columns), axis=1))
    odf = norm_dates(odf.reindex(sorted(odf.columns), axis=1))
    if list(sdf.columns) != list(odf.columns):
        return f"columns spark={list(sdf.columns)} oracle={list(odf.columns)}"
    # driver-style dtype check (int64 vs float64, object vs int64, ...)
    for c in sdf.columns:
        s, o = str(sdf[c].dtype), str(odf[c].dtype)
        if s.startswith("datetime64") and o.startswith("datetime64"):
            continue  # ns-vs-us resolution only; values compared below
        if s != o:
            return f"dtype {c}: spark={s} oracle={o}"
    if len(sdf) != len(odf):
        return f"rowcount spark={len(sdf)} oracle={len(odf)}"
    # non-scalar cells break the driver's comparator outright; scan the
    # first NON-NULL value (a leading null row would hide a list/Decimal
    # further down and let canon() str()-compare ndarrays green)
    for df, side in ((sdf, "spark"), (odf, "oracle")):
        for c in df.columns:
            if str(df[c].dtype) == "object" and len(df):
                nn = df[c].dropna()
                if len(nn):
                    b = bad_cell(nn.iloc[0])
                    if b:
                        return f"{side} col {c}: {b}"
    for c in sdf.columns:
        a = sdf[c].map(canon).values
        b = odf[c].map(canon).values
        neq = a != b
        if neq.any():
            i = int(np.argmax(neq))
            return (f"first diff col={c} row={i} "
                    f"spark={a[i]!r} oracle={b[i]!r} (n={int(neq.sum())})")
    return None


def main(sf_dir, out_dir, only):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_ok = n_bad = 0
    for name in sorted(oracle):
        if only and name not in only:
            continue
        try:
            odf = con.execute(oracle[name]).df()
        except Exception as e:
            print(f"FAIL  {name}: oracle error: {e}")
            n_bad += 1
            continue
        try:
            sdf = pads.dataset(f"{out_dir}/{name}").to_table().to_pandas()
        except Exception as e:
            print(f"FAIL  {name}: spark output unreadable: {e}")
            n_bad += 1
            continue
        err = check(name, sdf, odf)
        if err:
            print(f"FAIL  {name}: {err}")
            n_bad += 1
        else:
            print(f"ok    {name} ({len(sdf)} rows)")
            n_ok += 1
    print(f"== {n_ok} ok, {n_bad} fail ==")
    return 1 if n_bad else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2], set(sys.argv[3:])))

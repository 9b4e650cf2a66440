#!/usr/bin/env python3
"""Local stand-in for the driver's t2 correctness gate.

Usage: python3 tools/compare.py <sfDir> <verifyOutDir>

For each query dir under <verifyOutDir>: load the Spark-written parquet
and the DuckDB oracle result (oracle_sql.json run against the sf parquet
tables), sort columns by name, canonicalize, and compare row sets +
order. Prints one line per query: OK / SCHEMA / ROWS / HASH diff.
"""
import json
import math
import sys

import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def canon(v):
    if v is None:
        return None
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        # bit-exact float compare via repr
        return repr(v)
    if isinstance(v, (list, tuple)):
        return tuple(canon(x) for x in v)
    if isinstance(v, dict):
        return tuple(sorted((k, canon(x)) for k, x in v.items()))
    return str(v)


def fetch(con, sql):
    cur = con.execute(sql)
    cols = [d[0] for d in cur.description]
    types = [str(d[1]) for d in cur.description]
    rows = cur.fetchall()
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    return ([cols[i] for i in order],
            [types[i] for i in order],
            [tuple(canon(r[i]) for i in order) for r in rows])


def main(sf_dir, out_dir):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_ok = n_bad = 0
    for name in sorted(oracle):
        sql = oracle[name]
        try:
            ocols, otypes, orows = fetch(con, sql)
        except Exception as e:
            print(f"FAIL  {name}: oracle error: {e}")
            n_bad += 1
            continue
        try:
            scols, stypes, srows = fetch(
                con, f"SELECT * FROM read_parquet('{out_dir}/{name}/*.parquet')")
        except Exception as e:
            print(f"FAIL  {name}: spark output unreadable: {e}")
            n_bad += 1
            continue
        if scols != ocols:
            print(f"FAIL  {name}: columns spark={scols} oracle={ocols}")
            n_bad += 1
            continue
        if stypes != otypes:
            diffs = [f"{c}: spark={s} oracle={o}"
                     for c, s, o in zip(scols, stypes, otypes) if s != o]
            print(f"TYPE  {name}: {'; '.join(diffs)}")
            # type-only mismatch is reported but rows are still compared
        if len(srows) != len(orows):
            print(f"FAIL  {name}: rowcount spark={len(srows)} oracle={len(orows)}")
            n_bad += 1
            continue
        if srows != orows:
            bad = next(i for i in range(len(srows)) if srows[i] != orows[i])
            print(f"FAIL  {name}: first diff at row {bad}:")
            print(f"      spark : {srows[bad]}")
            print(f"      oracle: {orows[bad]}")
            n_bad += 1
            continue
        print(f"ok    {name} ({len(srows)} rows)")
        n_ok += 1
    print(f"== {n_ok} ok, {n_bad} fail ==")
    return 1 if n_bad else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))

"""Local mirror of the driver's correctness gate: run every
__spark_entry__.queries() entry on Spark and, where an oracle_sql()
exists, the same SQL on DuckDB over the same parquet; compare row count,
column names, and an order-insensitive canonicalized value hash.

Usage: python scripts/check_oracle.py [--master local[32]]
       [--shuffle-partitions 32] [sf_dir] [query ...]

Defaults mirror the driver (local[32], 32 shuffle partitions; override
via ORACLE_MASTER / ORACLE_SHUFFLE env or the flags) so flaps caused by
partition-order-dependent float math reproduce locally before submission.
"""

from __future__ import annotations

import argparse
import hashlib
import math
import os
import sys
import time

import duckdb
import pandas as pd

sys.path.insert(0, "/root/repo")

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def canon_cell(v) -> str:
    if v is None or (isinstance(v, float) and math.isnan(v)):
        return "∅"
    if isinstance(v, float):
        if v == int(v) and abs(v) < 1e15:
            return str(int(v))
        return f"{v:.10g}"
    if isinstance(v, bytes):
        return v.hex()
    if isinstance(v, (list, tuple)):
        return "[" + ",".join(canon_cell(x) for x in v) + "]"
    return str(v)


def df_hash(pdf: pd.DataFrame) -> str:
    cols = sorted(pdf.columns)
    rows = sorted(
        tuple(canon_cell(pdf[c].iloc[i]) for c in cols) for i in range(len(pdf))
    )
    h = hashlib.sha256()
    for r in rows:
        h.update("\x1f".join(r).encode("utf-8"))
        h.update(b"\x1e")
    return h.hexdigest()[:16]


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--master", default=os.environ.get("ORACLE_MASTER", "local[32]"))
    ap.add_argument("--shuffle-partitions", type=int,
                    default=int(os.environ.get("ORACLE_SHUFFLE", "32")))
    ap.add_argument("sf_dir", nargs="?", default="/root/testdata/sf0.01")
    ap.add_argument("queries", nargs="*")
    args = ap.parse_args()
    sf_dir = args.sf_dir
    only = set(args.queries)

    import __spark_entry__ as entrymod
    from iceberg_cpp_spark.session import get_spark

    spark = get_spark(master=args.master,
                      shuffle_partitions=args.shuffle_partitions)
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")

    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    n_pass = n_fail = n_rowsonly = 0
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            sdf = fn(spark, sf_dir).toPandas()
        except Exception as e:
            print(f"FAIL  {name}: spark error: {type(e).__name__}: {str(e)[:200]}")
            n_fail += 1
            continue
        took = time.time() - t0
        if name not in oracles:
            print(f"rows  {name}: {len(sdf)} rows (no oracle) [{took:.1f}s]")
            n_rowsonly += 1
            continue
        try:
            odf = con.execute(oracles[name]).df()
        except Exception as e:
            print(f"FAIL  {name}: duckdb error: {type(e).__name__}: {str(e)[:200]}")
            n_fail += 1
            continue
        problems = []
        if len(sdf) != len(odf):
            problems.append(f"rows {len(sdf)} != {len(odf)}")
        if sorted(sdf.columns) != sorted(odf.columns):
            problems.append(f"cols {sorted(sdf.columns)} != {sorted(odf.columns)}")
        if not problems:
            hs, ho = df_hash(sdf), df_hash(odf)
            if hs != ho:
                problems.append(f"hash {hs} != {ho}")
                merged = sdf.sort_values(sorted(sdf.columns)[:2] if len(sdf.columns) > 1
                                         else list(sdf.columns)).head(3)
                print("  spark head:", merged.to_dict("records"))
                print("  duck  head:", odf.sort_values(sorted(odf.columns)[:2]
                                                       if len(odf.columns) > 1
                                                       else list(odf.columns))
                      .head(3).to_dict("records"))
        if problems:
            print(f"FAIL  {name}: {'; '.join(problems)} [{took:.1f}s]")
            n_fail += 1
        else:
            print(f"pass  {name}: {len(sdf)} rows [{took:.1f}s]")
            n_pass += 1
    print(f"\n{n_pass} pass, {n_fail} fail, {n_rowsonly} rows-only")
    return 1 if n_fail else 0


if __name__ == "__main__":
    sys.exit(main())

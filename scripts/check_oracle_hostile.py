"""Adversarial-environment mirror of the driver's correctness gate:
runs every queries() entry in a session configured UNLIKE ours —
parquet NTZ inference OFF (naive timestamps read as TIMESTAMP_LTZ) and
a non-UTC default session timezone — then compares against the DuckDB
oracles. The r02/r03 hash flaps were environment drift; a query that
passes BOTH this and scripts/check_oracle.py is flap-proof in either
read mode.

Usage: python scripts/check_oracle_hostile.py [sf_dir] [query ...]
"""

from __future__ import annotations

import sys

import duckdb

sys.path.insert(0, "/root/repo")


def main() -> int:
    from pyspark.sql import SparkSession

    import __spark_entry__ as e
    import scripts.check_oracle as co

    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])
    spark = (SparkSession.builder.master("local[32]")
             .appName("hostile-gate")
             .config("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
             .config("spark.sql.shuffle.partitions", "32")
             .config("spark.sql.session.timeZone", "America/New_York")
             .config("spark.ui.enabled", "false")
             .getOrCreate())
    spark.sparkContext.setLogLevel("ERROR")
    con = duckdb.connect()
    for t in co.TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM "
                    f"read_parquet('{sf}/{t}.parquet')")
    qs, oracles = e.queries(), e.oracle_sql()
    np_ = nf = nr = 0
    for name, fn in qs.items():
        if only and name not in only:
            continue
        try:
            sdf = fn(spark, sf).toPandas()
        except Exception as ex:
            print(f"FAIL {name}: {type(ex).__name__}: {str(ex)[:150]}")
            nf += 1
            continue
        if name not in oracles:
            nr += 1
            continue
        odf = con.execute(oracles[name]).df()
        ok = (len(sdf) == len(odf)
              and sorted(sdf.columns) == sorted(odf.columns)
              and co.df_hash(sdf) == co.df_hash(odf))
        if ok:
            np_ += 1
        else:
            print(f"FAIL {name}: rows {len(sdf)}/{len(odf)}")
            nf += 1
    print(f"{np_} pass, {nf} fail, {nr} rows-only")
    return 1 if nf else 0


if __name__ == "__main__":
    sys.exit(main())

"""Generate the bucket-transform oracle fixtures.

The DuckDB oracle cannot compute Iceberg's seed-0 murmur3_x86_32, so
`ice_bucket_transform` pins against precomputed (key -> bucket) tables
instead. The expected values come from ``BucketTransform.pyvalue`` — the
scalar byte-encoding path validated against the spec's Appendix-B golden
vectors (tests/test_transforms.py) — which is a DIFFERENT code path from
the vectorized numpy kernel the Spark query uses, so the oracle join is
a real cross-implementation check, not a self-comparison.

Covers the distinct keys of every testdata scale factor, so the oracle
works at sf0.001/sf0.01/sf0.1 alike. Deterministic: re-running produces
byte-identical fixtures.

Usage: python scripts/gen_bucket_fixture.py
"""

from __future__ import annotations

import sys

import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

sys.path.insert(0, "/root/repo")

from iceberg_cpp_spark.core import types as it  # noqa: E402
from iceberg_cpp_spark.functions.transforms import BucketTransform  # noqa: E402

SF_DIRS = ["/root/testdata/sf0.001", "/root/testdata/sf0.01",
           "/root/testdata/sf0.1"]


def main() -> None:
    orderkeys: set[int] = set()
    flags: set[str] = set()
    for d in SF_DIRS:
        t = pq.read_table(f"{d}/lineitem.parquet",
                          columns=["l_orderkey", "l_returnflag"])
        orderkeys.update(pc.unique(t.column("l_orderkey")).to_pylist())
        flags.update(pc.unique(t.column("l_returnflag")).to_pylist())

    b16 = BucketTransform(16)
    keys = sorted(orderkeys)
    pq.write_table(
        pa.table({"l_orderkey": pa.array(keys, pa.int64()),
                  "bucket16": pa.array(
                      [b16.pyvalue(k, it.LongType()) for k in keys],
                      pa.int32())}),
        "/root/repo/assets/bucket16_l_orderkey.parquet")

    b8 = BucketTransform(8)
    fl = sorted(flags)
    pq.write_table(
        pa.table({"l_returnflag": pa.array(fl, pa.string()),
                  "bucket8_str": pa.array(
                      [b8.pyvalue(v, it.StringType()) for v in fl],
                      pa.int32())}),
        "/root/repo/assets/bucket8_l_returnflag.parquet")
    print(f"wrote {len(keys)} orderkey buckets, {len(fl)} flag buckets")


if __name__ == "__main__":
    main()

"""Capture .explain('formatted') for registry queries into
plans/r17/<name>_<tag>.txt.  Usage:
    python scripts/capture_plans_r17.py before q1_pricing_summary ...
"""
from __future__ import annotations

import io
import os
import sys
from contextlib import redirect_stdout

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entrymod  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
OUT = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "plans", "r17")


def main():
    tag = sys.argv[1]
    names = sys.argv[2:]
    os.makedirs(OUT, exist_ok=True)
    from iceberg_cpp_spark.session import get_spark
    spark = get_spark(app_name="plans-r17")
    spark.sparkContext.setLogLevel("ERROR")
    qs = entrymod.queries()
    for n in names:
        df = qs[n](spark, SF_DIR)
        buf = io.StringIO()
        with redirect_stdout(buf):
            df.explain("formatted")
        with open(os.path.join(OUT, f"{n}_{tag}.txt"), "w") as fh:
            fh.write(buf.getvalue())
        print(f"wrote {n}_{tag}.txt ({len(buf.getvalue())} bytes)")


if __name__ == "__main__":
    main()

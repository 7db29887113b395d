"""Benchmark harness: runs the headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints
ONE JSON line:
  {"metric": "...", "value": N, "unit": "sec", "queries": {...}, "sf": ...}

Each query is fully materialized through the noop sink (no driver-side
collect in the measurement path). A small warmup query first absorbs
JVM/codegen startup so per-query numbers reflect steady state.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import __spark_entry__ as entrymod  # noqa: E402

BENCH_QUERIES = [
    "q1_pricing_summary",
    "q3_shipping_priority",
    "q5_local_supplier",
    "q6_forecast_revenue",
    "q8_market_share",
    "q18_large_volume_customer",
    "window_top_orders",
    "agg_rollup",
    "set_ops",
    "events_window_agg",
    "ice_transforms",
    "ice_roundtrip_agg",
    "ice_partition_pruned",
    "dedup_exact",
    "dedup_minhash",
    "ann_topk",
    "text_stats",
    # mutation path (write/delete/maintenance regressions visible
    # round-over-round, VERDICT r03 item 5)
    "ice_merge_into",
    "ice_deletion_vector",
    "ice_compaction",
]


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = float(os.path.basename(sf_dir.rstrip("/")).replace("sf", "") or 0.1)

    from iceberg_cpp_spark.session import get_spark

    spark = get_spark(app_name="iceberg-cpp-spark-bench")
    spark.sparkContext.setLogLevel("ERROR")

    qs = entrymod.queries()
    # warmup: JVM + python-worker startup
    qs["q1_pricing_summary"](spark, sf_dir).write.format("noop").mode("overwrite").save()

    results: dict[str, float] = {}
    for name in BENCH_QUERIES:
        t0 = time.time()
        qs[name](spark, sf_dir).write.format("noop").mode("overwrite").save()
        results[name] = round(time.time() - t0, 3)

    total = round(sum(results.values()), 3)
    print(json.dumps({
        "metric": "bench_suite_seconds",
        "value": total,
        "unit": "sec",
        "queries": results,
        "sf": sf,
    }))


if __name__ == "__main__":
    main()

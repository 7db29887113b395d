"""Run a subset of the bench rows with bench.py's exact methodology
(warmup q1, min-of-N through the noop sink) for fast optimization
iteration.  Usage: python scripts/bench_subset.py ice_merge_into ...
Env: SPARK_GRAFT_BENCH_RUNS (default 3)."""
from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entrymod  # noqa: E402


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    runs = int(os.environ.get("SPARK_GRAFT_BENCH_RUNS", "3"))
    from iceberg_cpp_spark.session import get_spark
    spark = get_spark(app_name="bench-subset-r17")
    spark.sparkContext.setLogLevel("ERROR")
    import bench as benchmod
    qs = entrymod.queries()
    qs["q1_pricing_summary"](spark, sf_dir).write.format("noop") \
        .mode("overwrite").save()
    micro = {
        "ice_scan_plane": lambda: benchmod.bench_scan_planes(spark, sf_dir),
        "retrieval_bm25": lambda: benchmod.bench_bm25_index(spark, sf_dir),
        "jpeg_codec_roundtrip": lambda: benchmod.bench_jpeg_codec(spark, sf_dir),
        "ice_plan_50k": lambda: benchmod.bench_plan_50k(spark),
        "ice_plan_200k": lambda: benchmod.bench_plan_200k(spark),
        "ice_commit_1m": lambda: benchmod.bench_commit_1m(spark),
        "ice_clone_200k": lambda: benchmod.bench_snapshot_clone(spark),
    }
    results = {}
    for name in sys.argv[1:]:
        if name in micro:
            results.update(micro[name]())
            continue
        best = None
        for _ in range(max(runs, 1)):
            t0 = time.time()
            qs[name](spark, sf_dir).write.format("noop") \
                .mode("overwrite").save()
            el = time.time() - t0
            best = el if best is None else min(best, el)
        results[name] = round(best, 3)
    print(json.dumps(results))


if __name__ == "__main__":
    main()

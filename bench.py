"""Benchmark harness: runs the headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints
ONE JSON line:
  {"metric": "...", "value": N, "unit": "sec", "queries": {...}, "sf": ...}

Each query is fully materialized through the noop sink (no driver-side
collect in the measurement path). A small warmup query first absorbs
JVM/codegen startup so per-query numbers reflect steady state.

Each query is timed BENCH_RUNS times and the MIN is reported (same
warm+best pattern bench_scan_planes uses): round 6 proved a single-run
harness is noise-dominated — it reported +31% suite-wide on code the
regressed queries never execute. min-of-N makes the round-over-round
comparison reflect code, not machine load.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import __spark_entry__ as entrymod  # noqa: E402


def _vm_rss_mib() -> float:
    """CURRENT resident set size in MiB (/proc/self/status VmRSS).
    ru_maxrss is a process-lifetime HIGH-WATER mark: after a
    memory-heavy suite row its delta reads ~0 regardless of the row
    under test, making the bound vacuous (ADVICE r13). A current-RSS
    delta can dip slightly negative under GC — the < 256 MiB bound is
    unaffected and stays meaningful in any suite order."""
    with open("/proc/self/status") as fh:
        for line in fh:
            if line.startswith("VmRSS:"):
                return int(line.split()[1]) / 1024.0
    raise RuntimeError("VmRSS not found in /proc/self/status")


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
    "ann_pq_topk",
    "text_stats",
    "text_contamination",
    # mutation path (write/delete/maintenance regressions visible
    # round-over-round, VERDICT r03 item 5)
    "ice_merge_into",
    # r16: the full-sync MERGE (WHEN NOT MATCHED BY SOURCE) — the CoW
    # all-files rewrite shape plus the enforced cardinality guard stay
    # regression-visible
    "ice_merge_sync",
    "ice_deletion_vector",
    "ice_compaction",
    # newest operators (VERDICT r06 item 7): the bucketed pack_sequences
    # and chunking rewrites plus single-snapshot CDC apply stay
    # regression-visible
    "text_chunking",
    "sample_pack",
    "ice_cdc_apply",
    # codec path (VERDICT r07 task 7): the only first-class operator
    # family previously without a perf trend — real PNG encode+decode
    # through the Arrow-batched mapInPandas pipeline
    "multimodal_png_real",
    # r10 additions: ORC interop leg and the real animated-GIF decoder
    "ice_orc_data",
    "multimodal_gif_frames",
    # r10: v3 variant plane (JVM metrics aggregation + DV scan + extract)
    "ice_variant",
    # r12 additions: exact geometry (file-pruned polygon filter + the
    # point-in-polygon join), variant shredding (shadow-column write +
    # synthetic-id pruning), persisted BM25 (two-batch index build +
    # token-pruned search)
    "geo_exact_filter",
    "geo_pip_join",
    "ice_variant_shred",
    # retrieval_bm25_indexed (r12) split in r14 into the
    # retrieval_bm25_build / retrieval_bm25_search microbench pair
    # (bench_bm25_index): the one-row version conflated one-time index
    # construction with the amortized search the design optimizes.
    # r10: v3 geometry plane (WKB encode UDF + envelope bounds harvest
    # + st_intersects file pruning + Arrow-batched row envelope filter)
    "ice_geo_bbox",
]

# min-of-N runs per query; override with SPARK_GRAFT_BENCH_RUNS
BENCH_RUNS = int(os.environ.get("SPARK_GRAFT_BENCH_RUNS", "3"))


def bench_scan_planes(spark, sf_dir: str) -> dict[str, float]:
    """Large-N data-plane comparison (VERDICT r4 item 1): the SAME
    multi-file table full-scanned through the default jvm-union plane
    (batched spark.read.parquet legs, JVM vectorized decode) and the
    python-datasource plane (bin-packed ScanPartitions, Python Arrow
    decode). Table build is excluded from the timings; the ratio
    ice_scan_plane_py / ice_scan_plane_jvm is the graded number."""
    import shutil
    import tempfile

    from pyspark.sql import functions as F

    from iceberg_cpp_spark import IceTable
    from iceberg_cpp_spark.core.types import schema_from_spark

    li = spark.read.parquet(os.path.join(sf_dir, "lineitem.parquet"))
    root = tempfile.mkdtemp(prefix="bench_plane_")
    t = IceTable.create(spark, os.path.join(root, "t"),
                        schema_from_spark(li.schema))
    li8 = li.repartition(8)
    for _ in range(8):
        t.append(li8)  # 64 files

    def scan_time(tbl) -> float:
        # warm + best-of-4: the python plane's first post-warm runs
        # still pay python-worker spin-up jitter, which made this row
        # oscillate ±24% across rounds on unchanged code (VERDICT r08
        # task 7) — deeper min-of-N pins the steady-state number
        best = None
        for i in range(5):
            t0 = time.time()
            (tbl.scan().to_df()
             .agg(F.count("*"),
                  F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))))
             .write.format("noop").mode("overwrite").save())
            el = time.time() - t0
            if i > 0:
                best = el if best is None else min(best, el)
        return round(best, 3)

    out = {
        "ice_scan_plane_jvm": scan_time(t.update_properties(
            {"engine.read.jvm-path-batch-size": "8"})),
        "ice_scan_plane_py": scan_time(t.update_properties(
            {"engine.read.large-scan-strategy": "python-datasource",
             "engine.read.datasource-file-threshold": "1"})),
    }
    shutil.rmtree(root, ignore_errors=True)
    return out


def bench_jpeg_codec(spark, sf_dir: str) -> dict[str, float]:
    """JPEG codec microbench (VERDICT r07 task 7): render each sf
    document into a 48x48 grayscale baseline JPEG and decode it back,
    all inside one Arrow-batched mapInPandas pass — tracks the numpy
    T.81 codec (operators/jpeg.py) round-over-round. Reported per-query
    only (excluded from the headline total, like the scan planes)."""
    from pyspark.sql import functions as F

    # fixed 1000-doc slice: the microbench tracks CODEC throughput, and a
    # corpus-sized input would dominate bench wall-clock at larger sf
    docs = (spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))
            .orderBy("doc_id").limit(1000))

    def run(batches):
        import numpy as np
        import pandas as pd

        from iceberg_cpp_spark.operators import jpeg

        for b in batches:
            ok = 0
            for t in b["text"]:
                raw = np.frombuffer((t or " ").encode("utf-8"), np.uint8)
                img = np.zeros(48 * 48, np.uint8)
                n = min(len(raw), img.size)
                img[:n] = raw[:n]
                d = jpeg.decode_jpeg(jpeg.encode_jpeg(
                    img.reshape(48, 48), quality=85, subsampling="444"))
                ok += int(d["pixels"].shape == (48, 48, 1))
            yield pd.DataFrame({"n_ok": [ok]})

    best = None
    for i in range(3):  # warm + best-of-2
        t0 = time.time()
        (docs.select("text").mapInPandas(run, schema="n_ok long")
         .agg(F.sum("n_ok")).write.format("noop").mode("overwrite").save())
        el = time.time() - t0
        if i > 0:
            best = el if best is None else min(best, el)
    return {"jpeg_codec_roundtrip": round(best, 3)}


def bench_bm25_index(spark, sf_dir: str) -> dict[str, float]:
    """Persisted BM25 index, build and search timed SEPARATELY
    (VERDICT r13 task 3): the former retrieval_bm25_indexed row (5.3s)
    was construction-dominated — build is one-time and amortizes over
    the corpus lifetime, while search is the per-query cost the
    token-range-clustered postings layout optimizes. Same two-batch
    incremental build + same query set as the registry/oracle row."""
    import shutil
    import tempfile

    from pyspark.sql import functions as F

    from iceberg_cpp_spark.operators import retrieval as rt

    docs = spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))
    even = docs.filter(F.col("doc_id") % 2 == 0)
    odd = docs.filter(F.col("doc_id") % 2 == 1)
    q = (docs.filter(F.col("doc_id") % 97 == 3)
         .select(F.col("doc_id").alias("query_id"),
                 F.expr("substring(text, 1, 60)").alias("query_text")))

    roots: list[str] = []
    build_best = None
    idx = None
    for i in range(3):  # warm + best-of-2; each run builds fresh
        root = tempfile.mkdtemp(prefix="bench_bm25_")
        roots.append(root)
        t0 = time.time()
        idx = rt.Bm25Index.build(spark, os.path.join(root, "idx"), even)
        idx = idx.add(odd)
        el = time.time() - t0
        if i > 0:
            build_best = el if build_best is None else min(build_best, el)

    search_best = None
    for i in range(3):  # warm + best-of-2 against the last-built index
        t0 = time.time()
        idx.search(q, k=5).write.format("noop").mode("overwrite").save()
        el = time.time() - t0
        if i > 0:
            search_best = el if search_best is None else min(search_best, el)
    for root in roots:
        shutil.rmtree(root, ignore_errors=True)
    return {"retrieval_bm25_build": round(build_best, 3),
            "retrieval_bm25_search": round(search_best, 3)}


def bench_plan_50k(spark) -> dict[str, float]:
    """Scan-PLANNING microbench (VERDICT r09 task 5): 50k synthetic
    manifest entries (fake file paths — planning never opens data
    files) through the distributed planner, pinning the metadata-plane
    cost SCALE.md's 10^5-file claim rests on. Reported per-query only
    (no data is scanned, so it stays out of the headline total)."""
    import shutil
    import tempfile

    from iceberg_cpp_spark import IceTable
    from iceberg_cpp_spark.core import manifests as mfs
    from iceberg_cpp_spark.core import types as itt
    from iceberg_cpp_spark.plans import expressions as ex
    from iceberg_cpp_spark.table import DataOperation

    # realistic WIDE stats: 8 columns, every file carries bounds +
    # counts for all of them (the shape the referenced-field subset
    # optimization targets — a filter on one column must not pay for
    # converting the other seven columns' stats)
    schema = itt.Schema(
        [itt.NestedField(1, "id", itt.LongType(), required=True)]
        + [itt.NestedField(i, f"c{i}", itt.LongType())
           for i in range(2, 9)], schema_id=0)
    root = tempfile.mkdtemp(prefix="bench_plan_")
    t = IceTable.create(spark, os.path.join(root, "t"), schema)
    n = 50_000
    all_ids = list(range(1, 9))
    files = [mfs.DataFile(
        content=mfs.CONTENT_DATA, file_path=f"/fake/data/f{i:06d}.parquet",
        file_format="parquet", partition={}, record_count=100,
        file_size_in_bytes=10_000,
        value_counts={f: 100 for f in all_ids},
        null_value_counts={f: 0 for f in all_ids},
        lower_bounds={f: (i * 100).to_bytes(8, "little")
                      for f in all_ids},
        upper_bounds={f: (i * 100 + 99).to_bytes(8, "little")
                      for f in all_ids},
    ) for i in range(n)]
    t._commit_files(files, operation=DataOperation.APPEND)

    best = None
    for i in range(3):  # warm + best-of-2
        t0 = time.time()
        tasks = t.scan().plan_files()
        pruned = t.scan(
            filter=ex.lt(ex.Reference("id"), 100 * 100)).plan_files()
        el = time.time() - t0
        assert len(tasks) == n and len(pruned) == 100
        if i > 0:
            best = el if best is None else min(best, el)
    shutil.rmtree(root, ignore_errors=True)
    return {"ice_plan_50k": round(best, 3)}


def bench_plan_200k(spark) -> dict[str, float]:
    """Planning beyond 10^5 files (VERDICT r10 task 6): 200k synthetic
    manifest entries through plan_files_df — the UNCOLLECTED plan plane.
    Times (a) a full-plan aggregate (file count + byte sum, zero
    FileScanTasks materialized) and (b) a bounds-filtered plan collect
    of the 100 surviving entries. Asserts the driver RSS grows < 256
    MiB across both — the point of the plane is that 200k (and
    therefore 10^6+) entries never exist as Python objects."""
    import shutil
    import tempfile

    from pyspark.sql import functions as F

    from iceberg_cpp_spark import IceTable
    from iceberg_cpp_spark.core import manifests as mfs
    from iceberg_cpp_spark.core import types as itt
    from iceberg_cpp_spark.plans import expressions as ex
    from iceberg_cpp_spark.table import DataOperation

    schema = itt.Schema(
        [itt.NestedField(1, "id", itt.LongType(), required=True)]
        + [itt.NestedField(i, f"c{i}", itt.LongType())
           for i in range(2, 9)], schema_id=0)
    root = tempfile.mkdtemp(prefix="bench_plan200_")
    t = IceTable.create(spark, os.path.join(root, "t"), schema)
    n = 200_000
    all_ids = list(range(1, 9))
    files = [mfs.DataFile(
        content=mfs.CONTENT_DATA, file_path=f"/fake/data/f{i:06d}.parquet",
        file_format="parquet", partition={}, record_count=100,
        file_size_in_bytes=10_000,
        value_counts={f: 100 for f in all_ids},
        null_value_counts={f: 0 for f in all_ids},
        lower_bounds={f: (i * 100).to_bytes(8, "little")
                      for f in all_ids},
        upper_bounds={f: (i * 100 + 99).to_bytes(8, "little")
                      for f in all_ids},
    ) for i in range(n)]
    t._commit_files(files, operation=DataOperation.APPEND)
    del files

    rss0 = _vm_rss_mib()
    best = None
    for i in range(3):  # warm + best-of-2
        t0 = time.time()
        agg = (t.scan().plan_files_df()
               .agg(F.count("*").alias("files"),
                    F.sum("file_size_in_bytes").alias("bytes"))
               .collect()[0])
        pruned = (t.scan(filter=ex.lt(ex.Reference("id"), 100 * 100))
                  .plan_files_df().collect())
        el = time.time() - t0
        assert agg["files"] == n and len(pruned) == 100
        if i > 0:
            best = el if best is None else min(best, el)
    rss_delta_mib = _vm_rss_mib() - rss0
    assert rss_delta_mib < 256, (
        f"plan_files_df grew driver RSS by {rss_delta_mib:.0f} MiB at "
        "200k entries — the plan is leaking onto the driver")
    shutil.rmtree(root, ignore_errors=True)
    return {"ice_plan_200k": round(best, 3)}


def bench_commit_1m(spark) -> dict[str, float]:
    """Committing 10^6 data files in ONE snapshot (VERDICT r12 task 1):
    synthetic descriptors stay a DataFrame end-to-end — commit_files_df
    authors manifest shards in executors and the driver collects only
    pointer rows. Asserts the driver RSS grows < 256 MiB: a 10^6-long
    DataFile list would cost GBs. Also asserts the committed snapshot's
    summary counts and that a filtered plan over the result stays on the
    uncollected plane."""
    import shutil
    import tempfile

    from pyspark.sql import functions as F

    from iceberg_cpp_spark import IceTable
    from iceberg_cpp_spark.core import types as itt

    schema = itt.Schema(
        [itt.NestedField(1, "id", itt.LongType(), required=True)],
        schema_id=0)
    root = tempfile.mkdtemp(prefix="bench_commit1m_")
    n = 1_000_000
    t = IceTable.create(spark, os.path.join(root, "t"), schema)
    desc = spark.range(n).select(
        F.concat(F.lit("/fake/data/part-"), F.col("id"),
                 F.lit(".parquet")).alias("file_path"),
        F.lit(100).cast("long").alias("record_count"),
        F.lit(10_000).cast("long").alias("file_size_in_bytes"))
    rss0 = _vm_rss_mib()
    t0 = time.time()
    t = t.commit_files_df(desc)
    el = time.time() - t0
    rss_delta_mib = _vm_rss_mib() - rss0
    s = t.current_snapshot().summary
    assert s["added-data-files"] == str(n) and s["total-records"] == str(n * 100)
    files = (t.scan().plan_files_df()
             .agg(F.count("*").alias("files")).collect()[0]["files"])
    assert files == n
    assert rss_delta_mib < 256, (
        f"commit_files_df grew driver RSS by {rss_delta_mib:.0f} MiB at "
        "10^6 files — the commit is materializing file entries on the "
        "driver")
    shutil.rmtree(root, ignore_errors=True)
    return {"ice_commit_1m": round(el, 3)}


def bench_snapshot_clone(spark) -> dict[str, float]:
    """Zero-copy clone at 200k files (r15 snapshot_to): descriptors
    ride the manifest DataFrames into commit_files_df's executor
    authoring, so the timed clone is pure metadata work. Asserts the
    clone plans all 200k files and a < 256 MiB driver-RSS bound — a
    driver-side file-list materialization would blow it."""
    import shutil
    import tempfile

    from pyspark.sql import functions as F

    from iceberg_cpp_spark.core import types as itt
    from iceberg_cpp_spark.sources.catalog import FileSystemCatalog

    schema = itt.Schema(
        [itt.NestedField(1, "id", itt.LongType(), required=True)],
        schema_id=0)
    root = tempfile.mkdtemp(prefix="bench_clone_")
    cat = FileSystemCatalog(os.path.join(root, "wh"))
    cat.create_namespace("db")
    cat.create_table("db.src", schema)
    t = cat.load_table("db.src", spark=spark)
    n = 200_000
    desc = spark.range(n).select(
        F.concat(F.lit("/fake/data/part-"), F.col("id"),
                 F.lit(".parquet")).alias("file_path"),
        F.lit(100).cast("long").alias("record_count"),
        F.lit(10_000).cast("long").alias("file_size_in_bytes"))
    t = t.commit_files_df(desc)
    rss0 = _vm_rss_mib()
    t0 = time.time()
    clone = t.snapshot_to(cat, "db.clone")
    el = time.time() - t0
    rss_delta_mib = _vm_rss_mib() - rss0
    files = (clone.scan().plan_files_df()
             .agg(F.count("*").alias("f")).collect()[0]["f"])
    assert files == n
    assert clone.properties().get("gc.enabled") == "false"
    assert rss_delta_mib < 256, (
        f"snapshot_to grew driver RSS by {rss_delta_mib:.0f} MiB at "
        "200k files — the clone is materializing file entries on the "
        "driver")
    shutil.rmtree(root, ignore_errors=True)
    return {"ice_clone_200k": round(el, 3)}


def _loadavg() -> list[float]:
    """1/5/15-minute host load — recorded before and after the suite so
    a contended official run is self-evident from the JSON instead of
    requiring forensic cross-run comparison (VERDICT r16 task 5)."""
    try:
        with open("/proc/loadavg") as fh:
            return [float(x) for x in fh.read().split()[:3]]
    except OSError:
        return []


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = float(os.path.basename(sf_dir.rstrip("/")).replace("sf", "") or 0.1)
    load_before = _loadavg()
    wall_start = time.time()

    from iceberg_cpp_spark.session import get_spark

    spark = get_spark(app_name="iceberg-cpp-spark-bench")
    spark.sparkContext.setLogLevel("ERROR")

    qs = entrymod.queries()
    # warmup: JVM + python-worker startup
    qs["q1_pricing_summary"](spark, sf_dir).write.format("noop").mode("overwrite").save()

    results: dict[str, float] = {}
    for name in BENCH_QUERIES:
        best: float | None = None
        for _ in range(max(BENCH_RUNS, 1)):
            t0 = time.time()
            qs[name](spark, sf_dir).write.format("noop").mode("overwrite").save()
            el = time.time() - t0
            best = el if best is None else min(best, el)
        results[name] = round(best, 3)

    # headline total = the query suite only; the data-plane microbench
    # entries (one of which is the deliberately slower python plane) are
    # reported per-query but would distort cross-round total comparisons
    total = round(sum(results.values()), 3)
    results.update(bench_scan_planes(spark, sf_dir))
    results.update(bench_bm25_index(spark, sf_dir))
    results.update(bench_jpeg_codec(spark, sf_dir))
    results.update(bench_plan_50k(spark))
    results.update(bench_plan_200k(spark))
    results.update(bench_commit_1m(spark))
    results.update(bench_snapshot_clone(spark))
    print(json.dumps({
        "metric": "bench_suite_seconds",
        "value": total,
        "unit": "sec",
        "queries": results,
        "sf": sf,
        # additive measurement-context keys (the contract keys above
        # are unchanged): host load before/after + suite wall-clock,
        # so a contended run is visible in the record itself
        "load_before": load_before,
        "load_after": _loadavg(),
        "wall_seconds": round(time.time() - wall_start, 3),
    }))


if __name__ == "__main__":
    main()

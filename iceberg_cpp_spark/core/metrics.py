"""Per-file column metrics for DataFile entries.

Capability parity with the reference's write-side ``Metrics``
(metrics.h:33-42, populated by parquet_writer.cc:51-165): record count,
per-column sizes, value/null/nan counts and spec-encoded lower/upper
bounds. The reference collects them from its Arrow writer; this engine
harvests the identical statistics from the Parquet footers Spark already
wrote — a metadata-only read (no data pages touched).

Scale: footer harvesting is embarrassingly parallel. Below a threshold
the driver reads footers directly; above it, the path list is shipped to
executors via ``mapInPandas`` so a 10^5-file append never serializes
through the driver.
"""

from __future__ import annotations

import json
import math
import os
import warnings
from typing import Any, Iterable, Iterator, Optional

import numpy as np
import pyarrow.parquet as pq

from iceberg_cpp_spark.core import types as it
from iceberg_cpp_spark.core.literals import to_bytes

# switch from driver-side to executor-side footer harvesting. Footer
# reads are ~ms each; a Spark job costs python-worker startup per task,
# so the crossover is high — thousands of files, i.e. genuinely large
# appends where the driver would otherwise serialize minutes of I/O.
DISTRIBUTED_THRESHOLD = 2048
_DRIVER_THREADS = 16
_PATHS_PER_TASK = 64


def parse_metrics_mode(s: str):
    """``write.metadata.metrics.*`` value → mode tuple: ("none",),
    ("counts",), ("truncate", n) or ("full",) (reference declares the
    property + default, table_properties.h:234-235, with no write path
    behind it — this implements it)."""
    v = (s or "").strip().lower()
    if v in ("none", "counts", "full"):
        return (v,)
    if v.startswith("truncate(") and v.endswith(")"):
        n = int(v[len("truncate("):-1])
        if n <= 0:
            raise ValueError(f"truncate length must be positive: {s}")
        return ("truncate", n)
    raise ValueError(f"unknown metrics mode: {s!r}")


def metrics_modes(schema: it.Schema,
                  properties: dict) -> dict[int, tuple]:
    """Per-field-id metrics mode from table properties: the
    ``write.metadata.metrics.default`` mode (spec default truncate(16))
    overridden per column by ``write.metadata.metrics.column.<name>``
    (top-level or dotted nested name)."""
    default = parse_metrics_mode(
        properties.get("write.metadata.metrics.default", "truncate(16)"))
    out = {fid: default for _, (fid, _t) in _field_map(schema).items()}
    prefix = "write.metadata.metrics.column."
    for k, v in properties.items():
        if not k.startswith(prefix):
            continue
        name = k[len(prefix):]
        f = schema.find_field(name)
        if f is None:
            # Iceberg ignores metrics properties naming columns absent
            # from the current schema (drop_column/rename_column leave
            # stale keys behind) — a raise here would brick every
            # subsequent write to the table
            warnings.warn(
                f"ignoring metrics mode for unknown column: {name}",
                stacklevel=2)
            continue
        out[f.field_id] = parse_metrics_mode(v)
    return out


_MAX_CODE_POINT = 0x10FFFF


def truncate_lower_str(s: str, n: int) -> str:
    return s[:n]  # a prefix is <= the original: valid lower bound


def truncate_upper_str(s: str, n: int):
    """Shortest n-code-point string >= s: prefix with the last
    non-maximal code point incremented (skipping the surrogate block).
    None when no such string exists (all-max prefix) — keep the full
    value then."""
    if len(s) <= n:
        return s
    p = list(s[:n])
    for i in range(len(p) - 1, -1, -1):
        cp = ord(p[i])
        if cp >= _MAX_CODE_POINT:
            continue
        nxt = cp + 1
        if 0xD800 <= nxt <= 0xDFFF:
            nxt = 0xE000
        return "".join(p[:i]) + chr(nxt)
    return None


def truncate_lower_bytes(b: bytes, n: int) -> bytes:
    return bytes(b[:n])


def truncate_upper_bytes(b: bytes, n: int):
    if len(b) <= n:
        return bytes(b)
    p = bytearray(b[:n])
    for i in range(len(p) - 1, -1, -1):
        if p[i] != 0xFF:
            return bytes(p[:i]) + bytes([p[i] + 1])
    return None


def apply_metrics_modes(m: dict, modes: Optional[dict],
                        by_id: dict) -> None:
    """Post-process one file's metrics dict in place per the column
    modes (bounds already spec-encoded as bytes): none drops counts and
    bounds, counts drops bounds, truncate(n) shortens string/binary
    bounds while keeping them valid inclusive bounds (lower = prefix <=
    min; upper = incremented prefix >= max, full value kept when no
    incrementable prefix exists). Numeric/temporal bounds are
    fixed-width — truncate leaves them alone, as the spec does."""
    if not modes:
        return
    for fid, mode in modes.items():
        if mode == ("full",):
            continue
        if mode == ("none",):
            for key in ("value_counts", "null_value_counts",
                        "nan_value_counts", "lower_bounds", "upper_bounds"):
                m[key].pop(fid, None)
            continue
        if mode == ("counts",):
            m["lower_bounds"].pop(fid, None)
            m["upper_bounds"].pop(fid, None)
            continue
        n = mode[1]
        t = by_id.get(fid)
        lo = m["lower_bounds"].get(fid)
        hi = m["upper_bounds"].get(fid)
        if isinstance(t, it.StringType):
            if lo is not None:
                m["lower_bounds"][fid] = truncate_lower_str(
                    lo.decode("utf-8", errors="replace"), n).encode()
            if hi is not None:
                up = truncate_upper_str(
                    hi.decode("utf-8", errors="replace"), n)
                if up is not None:
                    m["upper_bounds"][fid] = up.encode()
        elif isinstance(t, it.BinaryType):
            if lo is not None:
                m["lower_bounds"][fid] = truncate_lower_bytes(lo, n)
            if hi is not None:
                up = truncate_upper_bytes(hi, n)
                if up is not None:
                    m["upper_bounds"][fid] = up


def _field_map(schema: it.Schema) -> dict[str, tuple[int, it.IcebergType]]:
    """Column path → (field_id, iceberg type): top-level primitives plus
    struct leaves as dotted paths (parquet ``path_in_schema`` shape), so
    nested fields get footer bounds too."""
    out: dict[str, tuple[int, it.IcebergType]] = {}

    def walk(prefix: str, fields) -> None:
        for f in fields:
            full = f"{prefix}{f.name}"
            if f.field_type.is_primitive:
                out[full] = (f.field_id, f.field_type)
            elif isinstance(f.field_type, it.StructType):
                walk(full + ".", f.field_type.fields)

    walk("", schema.fields)
    return out


def _stat_value(v: Any, t: it.IcebergType) -> Any:
    """Normalize a pyarrow footer statistic to the python value shape
    that ``literals.to_bytes`` expects for the given Iceberg type."""
    if v is None:
        return None
    if isinstance(t, it.StringType) and isinstance(v, bytes):
        return v.decode("utf-8", errors="replace")
    if isinstance(t, (it.FloatType, it.DoubleType)) and isinstance(v, float) and math.isnan(v):
        return None  # NaN is not a usable bound (spec: bounds skip NaN)
    return v


def file_metrics(path: str, fields: dict[str, tuple[int, it.IcebergType]],
                 modes=None) -> dict:
    """Read one Parquet footer → Iceberg metrics dict (bounds spec-encoded
    as bytes keyed by field id), post-processed per the column metrics
    modes (write.metadata.metrics.*)."""
    meta = pq.ParquetFile(path).metadata
    column_sizes: dict[int, int] = {}
    value_counts: dict[int, int] = {}
    null_counts: dict[int, int] = {}
    nan_counts: dict[int, int] = {}
    lowers: dict[int, Any] = {}
    uppers: dict[int, Any] = {}
    bounds_ok: dict[int, bool] = {}
    for rg in range(meta.num_row_groups):
        g = meta.row_group(rg)
        for ci in range(g.num_columns):
            col = g.column(ci)
            name = col.path_in_schema
            if name not in fields:
                continue  # unmapped (incl. list/map leaves); struct
                # leaves arrive as dotted paths when the field map
                # carries them (nested name mapping)
            fid, t = fields[name]
            column_sizes[fid] = column_sizes.get(fid, 0) + col.total_compressed_size
            value_counts[fid] = value_counts.get(fid, 0) + col.num_values
            st = col.statistics
            if isinstance(t, it.GEO_TYPES):
                # geo bounds are envelope WKB points, not byte-lexical
                # min/max — harvested from the data pages below
                if st is not None and st.null_count is not None:
                    null_counts[fid] = null_counts.get(fid, 0) + st.null_count
                bounds_ok[fid] = False
                continue
            if st is None:
                bounds_ok[fid] = False
                continue
            if st.null_count is not None:
                null_counts[fid] = null_counts.get(fid, 0) + st.null_count
            if st.has_min_max and bounds_ok.get(fid, True):
                try:
                    lo = _stat_value(st.min, t)
                    hi = _stat_value(st.max, t)
                except Exception:
                    # pyarrow can't cast some logical-type stats (e.g.
                    # decimal): decode the raw physical values directly
                    lo = _raw_stat_value(st.min_raw, t)
                    hi = _raw_stat_value(st.max_raw, t)
                if lo is None or hi is None:
                    bounds_ok[fid] = False
                else:
                    bounds_ok[fid] = True
                    lowers[fid] = lo if fid not in lowers or _lt(lo, lowers[fid]) else lowers[fid]
                    uppers[fid] = hi if fid not in uppers or _lt(uppers[fid], hi) else uppers[fid]
            else:
                bounds_ok[fid] = False
    lower_bounds = {}
    upper_bounds = {}
    for fid, ok in bounds_ok.items():
        if not ok:
            lowers.pop(fid, None)
            uppers.pop(fid, None)
    # v3 geospatial bounds: per-file planar envelope, encoded as the
    # spec's WKB bound points (lower=(xmin,ymin), upper=(xmax,ymax)).
    # Costs a columnar read of ONLY the geo columns of the new file
    # (append-sized, distributed past DISTRIBUTED_THRESHOLD with the
    # rest of the harvest). Top-level columns only — nested geo keeps
    # counts but no bounds.
    geo_cols = [(name, fid, t) for name, (fid, t) in fields.items()
                if isinstance(t, it.GEO_TYPES) and "." not in name]
    if geo_cols:
        from iceberg_cpp_spark.core import wkb

        tbl = pq.read_table(path, columns=[n for n, _, _ in geo_cols])
        for name, fid, t in geo_cols:
            vals = tbl.column(name).to_pylist()
            envs = wkb.envelopes_np(vals)
            if not bool((~np.isnan(envs[:, 0])).any()):
                continue  # all null/empty: no bounds
            lowers[fid] = wkb.point_wkb(float(np.nanmin(envs[:, 0])),
                                        float(np.nanmin(envs[:, 1])))
            uppers[fid] = wkb.point_wkb(float(np.nanmax(envs[:, 2])),
                                        float(np.nanmax(envs[:, 3])))
    by_id = {fid: t for _, (fid, t) in fields.items()}
    for fid, v in lowers.items():
        try:
            lower_bounds[fid] = to_bytes(v, by_id[fid])
        except Exception:
            pass
    for fid, v in uppers.items():
        try:
            upper_bounds[fid] = to_bytes(v, by_id[fid])
        except Exception:
            pass
    out = {
        "record_count": meta.num_rows,
        "file_size_in_bytes": os.path.getsize(path),
        "column_sizes": column_sizes,
        "value_counts": value_counts,
        "null_value_counts": null_counts,
        "nan_value_counts": nan_counts,
        "lower_bounds": lower_bounds,
        "upper_bounds": upper_bounds,
    }
    apply_metrics_modes(out, modes, by_id)
    return out


def _raw_stat_value(raw: Any, t: it.IcebergType) -> Any:
    """Physical-value statistics → python value. Decimals arrive as
    big-endian two's-complement unscaled bytes (FLBA) or plain ints
    (int32/int64 physical)."""
    if raw is None:
        return None
    if isinstance(t, it.DecimalType):
        from decimal import Decimal

        unscaled = (int.from_bytes(raw, "big", signed=True)
                    if isinstance(raw, (bytes, bytearray)) else int(raw))
        return Decimal(unscaled).scaleb(-t.scale)
    return _stat_value(raw, t)


def _lt(a: Any, b: Any) -> bool:
    try:
        return a < b
    except TypeError:
        return False


def _metrics_json(path: str, fields, modes=None) -> str:
    m = file_metrics(path, fields, modes)
    enc = dict(m)
    enc["lower_bounds"] = {k: v.hex() for k, v in m["lower_bounds"].items()}
    enc["upper_bounds"] = {k: v.hex() for k, v in m["upper_bounds"].items()}
    return json.dumps(enc)


def _decode_metrics_json(s: str) -> dict:
    m = json.loads(s)
    for key in ("column_sizes", "value_counts", "null_value_counts", "nan_value_counts"):
        m[key] = {int(k): v for k, v in m[key].items()}
    m["lower_bounds"] = {int(k): bytes.fromhex(v) for k, v in m["lower_bounds"].items()}
    m["upper_bounds"] = {int(k): bytes.fromhex(v) for k, v in m["upper_bounds"].items()}
    return m


def collect_metrics(spark, paths: list[str], schema: it.Schema,
                    modes=None) -> dict[str, dict]:
    """Metrics for every path. Driver-side for small appends; shipped to
    executors (Arrow-batched ``mapInPandas``) past DISTRIBUTED_THRESHOLD
    so scan-plan metadata work never bottlenecks on the driver."""
    fields = _field_map(schema)
    if spark is None or len(paths) <= DISTRIBUTED_THRESHOLD:
        if len(paths) <= 8:
            return {p: file_metrics(p, fields, modes) for p in paths}
        from concurrent.futures import ThreadPoolExecutor

        with ThreadPoolExecutor(_DRIVER_THREADS) as ex:
            return dict(zip(paths, ex.map(
                lambda p: file_metrics(p, fields, modes), paths)))

    import pandas as pd

    def harvest(batches: Iterable["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        for b in batches:
            yield pd.DataFrame({
                "path": b["path"],
                "metrics_json": [_metrics_json(p, fields, modes)
                                 for p in b["path"]],
            })

    pdf = spark.createDataFrame([(p,) for p in paths], "path string")
    rows = pdf.repartition(max(1, len(paths) // _PATHS_PER_TASK)).mapInPandas(
        harvest, schema="path string, metrics_json string"
    ).collect()
    return {r["path"]: _decode_metrics_json(r["metrics_json"]) for r in rows}


def _orc_counts_only(path: str) -> dict:
    import pyarrow.orc as po

    return {
        "record_count": int(po.ORCFile(path).nrows),
        "file_size_in_bytes": os.path.getsize(path),
        "column_sizes": {}, "value_counts": {}, "null_value_counts": {},
        "nan_value_counts": {}, "lower_bounds": {}, "upper_bounds": {},
    }


def _orc_file_metrics(path: str, fields=None, modes=None) -> dict:
    """One ORC file → Iceberg metrics dict with real per-column bounds,
    harvested from the footer's ColumnStatistics protobuf
    (core/orc_footer.py) — a tail read, no stripes touched. Falls back
    to counts-only (the pre-r12 behavior: pruning conservatively keeps
    the file) on footers this parser can't decode."""
    if not fields:
        return _orc_counts_only(path)
    from iceberg_cpp_spark.core import orc_footer as of

    try:
        footer = of.read_footer(path)
        ids = of.column_ids(footer.types)
    except Exception:
        return _orc_counts_only(path)
    nrows = int(footer.number_of_rows)
    column_sizes: dict[int, int] = {}
    value_counts: dict[int, int] = {}
    null_counts: dict[int, int] = {}
    lowers: dict[int, Any] = {}
    uppers: dict[int, Any] = {}
    by_id = {fid: t for _, (fid, t) in fields.items()}
    for name, (fid, t) in fields.items():
        tid = ids.get(name)
        if tid is None or tid >= len(footer.statistics):
            continue
        st = footer.statistics[tid]
        # Iceberg value_counts include nulls (parquet num_values shape);
        # ORC numberOfValues counts non-null — the difference, from any
        # nesting level, is the null count (parquet def-level semantics)
        value_counts[fid] = nrows
        if st.number_of_values is not None:
            null_counts[fid] = nrows - int(st.number_of_values)
        if st.bytes_on_disk:
            column_sizes[fid] = int(st.bytes_on_disk)
        lo, hi = of.stat_bounds(st, t)
        if lo is None or hi is None:
            continue
        if isinstance(t, (it.FloatType, it.DoubleType)) and (
                math.isnan(lo) or math.isnan(hi)):
            continue  # NaN is not a usable bound (spec: bounds skip NaN)
        try:
            lowers[fid] = to_bytes(lo, t)
            uppers[fid] = to_bytes(hi, t)
        except Exception:
            pass
    out = {
        "record_count": nrows,
        "file_size_in_bytes": os.path.getsize(path),
        "column_sizes": column_sizes,
        "value_counts": value_counts,
        "null_value_counts": null_counts,
        "nan_value_counts": {},
        "lower_bounds": lowers,
        "upper_bounds": uppers,
    }
    apply_metrics_modes(out, modes, by_id)
    return out


def collect_orc_metrics(spark, paths: list[str],
                        schema: Optional[it.Schema] = None,
                        modes=None) -> dict[str, dict]:
    """Footer harvest for ORC data files (``write.format.default=orc``).
    Reads each file's ColumnStatistics from the ORC footer protobuf so
    DataFile entries carry the same record/value/null counts and
    spec-encoded lower/upper bounds as the parquet path (reference
    metrics.h:33-42 is format-agnostic). Mirrors ``collect_metrics``'s
    driver/executor crossover; files whose footers can't be decoded
    (exotic codec) degrade to counts-only — pruning keeps them."""
    fields = _field_map(schema) if schema is not None else None
    if spark is None or len(paths) <= DISTRIBUTED_THRESHOLD:
        if len(paths) <= 8:
            return {p: _orc_file_metrics(p, fields, modes) for p in paths}
        from concurrent.futures import ThreadPoolExecutor

        with ThreadPoolExecutor(_DRIVER_THREADS) as ex:
            return dict(zip(paths, ex.map(
                lambda p: _orc_file_metrics(p, fields, modes), paths)))

    import pandas as pd

    def harvest(batches: Iterable["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        for b in batches:
            yield pd.DataFrame({
                "path": b["path"],
                "metrics_json": [_orc_metrics_json(p, fields, modes)
                                 for p in b["path"]],
            })

    pdf = spark.createDataFrame([(p,) for p in paths], "path string")
    rows = pdf.repartition(max(1, len(paths) // _PATHS_PER_TASK)).mapInPandas(
        harvest, schema="path string, metrics_json string"
    ).collect()
    return {r["path"]: _decode_metrics_json(r["metrics_json"]) for r in rows}


def _orc_metrics_json(path: str, fields, modes=None) -> str:
    m = _orc_file_metrics(path, fields, modes)
    enc = dict(m)
    enc["lower_bounds"] = {k: v.hex() for k, v in m["lower_bounds"].items()}
    enc["upper_bounds"] = {k: v.hex() for k, v in m["upper_bounds"].items()}
    return json.dumps(enc)


def schema_has_variant(schema: it.Schema) -> bool:
    """True when any field (top-level or nested) is an Iceberg v3
    ``variant`` — such files are unreadable by pyarrow (unrecognized
    Thrift LogicalType in the footer), so metrics must come from the
    JVM path (``collect_metrics_spark``)."""

    def walk(t: it.IcebergType) -> bool:
        if isinstance(t, it.VariantType):
            return True
        if isinstance(t, (it.StructType, it.Schema)):
            return any(walk(f.field_type) for f in t.fields)
        if isinstance(t, it.ListType):
            return walk(t.element_type)
        if isinstance(t, it.MapType):
            return walk(t.key_type) or walk(t.value_type)
        return False

    return any(walk(f.field_type) for f in schema.fields)


# types whose min/max Spark aggregates convert cleanly through
# literals.to_bytes (uuid rides its Spark string representation, same
# ordering the parquet-footer path uses)
_BOUNDABLE = (it.BooleanType, it.IntegerType, it.LongType, it.FloatType,
              it.DoubleType, it.DecimalType, it.DateType, it.TimestampType,
              it.TimestampTzType, it.TimeType, it.StringType, it.UuidType,
              it.BinaryType, it.FixedType, it.TimestampNsType,
              it.TimestampTzNsType)


def collect_metrics_spark(spark, paths: list[str], schema: it.Schema,
                          modes=None, shreds=None) -> dict[str, dict]:
    """Variant-safe metrics harvest: ONE JVM aggregation job over the
    just-written files, grouped by ``_metadata.file_path``. Used when
    the schema contains a v3 variant column (pyarrow cannot even open
    those footers). Costs a columnar pass over the new files instead of
    a footer read — executor-distributed, append-sized, never
    table-sized. Differences from the footer path, by design:

    - bounds are EXACT min/max (tighter than footer truncation) for
      top-level orderable primitives; nested struct leaves get no
      bounds (footer path reads them via dotted paths);
    - variant columns get value/null counts and NO bounds (the spec
      assigns variant no bounds);
    - ``column_sizes`` is empty (requires the footer);
    - timestamptz bounds aggregate as ``unix_micros`` longs, so they
      are session-timezone-proof.
    """
    from pyspark.sql import functions as F

    from iceberg_cpp_spark.core import types as ty

    spark_schema = ty.to_spark_schema(schema)
    # shredded variant extractions live as extra physical columns in
    # the just-written files: widen the read schema so their stats
    # aggregate under the synthetic shred field ids
    read_schema = spark_schema
    shred_cols: list[tuple[str, int, it.IcebergType]] = []
    for s in (shreds or []):
        from pyspark.sql import types as T

        sub = ty.to_spark_schema(it.Schema(
            [it.NestedField(1, "x", s.field_type)], schema_id=0))
        read_schema = T.StructType(
            list(read_schema.fields)
            + [T.StructField(s.shadow_name, sub.fields[0].dataType, True)])
        shred_cols.append((s.shadow_name, s.field_id, s.field_type))
    df = (spark.read.schema(read_schema).parquet(*paths)
          .withColumn("_fp", F.regexp_replace(
              F.col("_metadata.file_path"), "^file:(//)?", "")))

    aggs = [F.count(F.lit(1)).alias("_n")]
    plan: list[tuple[int, it.IcebergType, bool, bool]] = []  # fid, t, bounded, nan
    agg_fields = ([(f.name, f.field_id, f.field_type)
                   for f in schema.fields] + shred_cols)
    for name, fid, t in agg_fields:
        c = F.col(name)
        aggs.append(F.sum(F.isnull(c).cast("long")).alias(f"_null_{fid}"))
        bounded = isinstance(t, _BOUNDABLE)
        nan = isinstance(t, (it.FloatType, it.DoubleType))
        if bounded:
            if isinstance(t, it.TimestampTzType):
                aggs.append(F.unix_micros(F.min(c)).alias(f"_lo_{fid}"))
                aggs.append(F.unix_micros(F.max(c)).alias(f"_hi_{fid}"))
            elif nan:
                # spec: NaN is not a usable bound — aggregate over the
                # non-NaN slice only
                nn = F.when(~F.isnan(c), c)
                aggs.append(F.min(nn).alias(f"_lo_{fid}"))
                aggs.append(F.max(nn).alias(f"_hi_{fid}"))
            else:
                aggs.append(F.min(c).alias(f"_lo_{fid}"))
                aggs.append(F.max(c).alias(f"_hi_{fid}"))
        if nan:
            aggs.append(F.sum(F.isnan(c).cast("long")).alias(f"_nan_{fid}"))
        plan.append((fid, t, bounded, nan))

    out: dict[str, dict] = {}
    for r in df.groupBy("_fp").agg(*aggs).collect():
        n = r["_n"]
        m = {
            "record_count": n,
            "file_size_in_bytes": os.path.getsize(r["_fp"]),
            "column_sizes": {},
            "value_counts": {}, "null_value_counts": {},
            "nan_value_counts": {},
            "lower_bounds": {}, "upper_bounds": {},
        }
        for fid, t, bounded, nan in plan:
            m["value_counts"][fid] = n
            m["null_value_counts"][fid] = r[f"_null_{fid}"] or 0
            if nan:
                m["nan_value_counts"][fid] = r[f"_nan_{fid}"] or 0
            if bounded:
                lo, hi = r[f"_lo_{fid}"], r[f"_hi_{fid}"]
                if lo is not None and hi is not None:
                    try:
                        m["lower_bounds"][fid] = to_bytes(lo, t)
                        m["upper_bounds"][fid] = to_bytes(hi, t)
                    except Exception:
                        m["lower_bounds"].pop(fid, None)
                        m["upper_bounds"].pop(fid, None)
        out[r["_fp"]] = m
    # a written-but-empty file contributes no groupBy row — synthesize
    # a zero-record entry so the caller's record_count==0 skip applies
    # (same contract as the footer path, which reads num_rows=0)
    for p in paths:
        if p not in out:
            out[p] = {"record_count": 0,
                      "file_size_in_bytes": os.path.getsize(p),
                      "column_sizes": {}, "value_counts": {},
                      "null_value_counts": {}, "nan_value_counts": {},
                      "lower_bounds": {}, "upper_bounds": {}}

    # geo bounds can't come from a JVM aggregation (envelope needs WKB
    # parsing) — one extra Arrow-batched pass over ONLY the geo columns
    # fills them in, so variant+geo tables keep st_intersects pruning
    geo = [f for f in schema.fields if isinstance(f.field_type, it.GEO_TYPES)]
    if geo:
        import pandas as pd

        from iceberg_cpp_spark.core import wkb

        names = [f.name for f in geo]
        fids = [f.field_id for f in geo]

        def envs(pdf: "pd.DataFrame") -> "pd.DataFrame":
            row = {"_fp": [pdf["_fp"].iloc[0]]}
            for name in names:
                e = wkb.envelopes_np(pdf[name].tolist())
                ok = ~np.isnan(e[:, 0])
                if ok.any():
                    row[f"_b_{name}"] = [json.dumps([
                        float(np.nanmin(e[:, 0])), float(np.nanmin(e[:, 1])),
                        float(np.nanmax(e[:, 2])), float(np.nanmax(e[:, 3]))])]
                else:
                    row[f"_b_{name}"] = [None]
            return pd.DataFrame(row)

        out_schema = "_fp string, " + ", ".join(
            f"_b_{n} string" for n in names)
        rows = (df.select("_fp", *names).groupBy("_fp")
                .applyInPandas(envs, schema=out_schema).collect())
        for r in rows:
            m = out.get(r["_fp"])
            if m is None:
                continue
            for name, fid in zip(names, fids):
                b = r[f"_b_{name}"]
                if b is None:
                    continue
                xmin, ymin, xmax, ymax = json.loads(b)
                m["lower_bounds"][fid] = wkb.point_wkb(xmin, ymin)
                m["upper_bounds"][fid] = wkb.point_wkb(xmax, ymax)
    if modes:
        by_id2 = {f.field_id: f.field_type for f in schema.fields}
        by_id2.update({s.field_id: s.field_type for s in (shreds or [])})
        for m in out.values():
            apply_metrics_modes(m, modes, by_id2)
    return out

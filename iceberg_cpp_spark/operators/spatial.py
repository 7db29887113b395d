"""Distributed spatial operators over WKB geometry columns.

The reference engine has no geospatial surface at all (its type enum
stops at v2 — type_fwd.h:34); these operators extend the v3
geometry/geography support (core/wkb.py, the st_intersects scan
predicate) with the join-shaped work a geospatial pipeline needs.

Scale shape (the point of this module): ``bbox_join`` is a
GRID-BUCKETED join — each geometry's envelope lands in every grid cell
it overlaps (exactly one cell for points), candidates meet through one
equi-join on the cell key, and duplicate candidate pairs are eliminated
with the standard REFERENCE-POINT rule (emit a pair only in the cell
containing the pair's reference corner) so there is NO distinct()
shuffle afterwards. Total cost: one envelope pass per side (Arrow-
batched, numpy fast path for point corpora), one explode (length 1 for
points), one hash join on cell keys — never a cartesian product.

Cell-size guidance: pick ``cell`` ≥ the typical envelope extent so the
explode factor stays ~1-4; extremely dense cells (urban hot spots)
behave like any skewed join key — AQE skew-join handles moderate skew,
and a finer grid both shrinks cells and spreads keys.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _envelope_struct_udf():
    """Arrow-batched WKB → envelope struct(xmin,ymin,xmax,ymax); null
    for null/empty geometries. numpy fast path for uniform 2D points
    (core/wkb.envelopes_np) — no per-row Python on point corpora."""
    import numpy as np
    import pandas as pd
    from pyspark.sql.functions import pandas_udf

    from iceberg_cpp_spark.core import wkb

    def env(vals):
        e = wkb.envelopes_np(vals.tolist())
        dead = np.isnan(e[:, 0])
        cols = {}
        for i, name in enumerate(("xmin", "ymin", "xmax", "ymax")):
            c = pd.Series(e[:, i], index=vals.index, dtype="object")
            c[dead] = None
            cols[name] = c
        return pd.DataFrame(cols)

    env.__annotations__ = {"vals": pd.Series, "return": pd.DataFrame}
    return pandas_udf(
        env, "xmin double, ymin double, xmax double, ymax double")


def with_envelope(df: DataFrame, geom_col: str = "geom",
                  out_col: str = "envelope") -> DataFrame:
    """Attach ``out_col`` = struct(xmin, ymin, xmax, ymax) computed from
    the WKB column (null for null/empty geometries)."""
    return df.withColumn(out_col, _envelope_struct_udf()(F.col(geom_col)))


def _cells(env: Column, cell: float) -> Column:
    """Every (cx, cy) grid cell the envelope overlaps, as an array of
    structs — length 1 for point geometries."""
    cx = F.sequence(F.floor(env["xmin"] / cell),
                    F.floor(env["xmax"] / cell))
    cy = F.sequence(F.floor(env["ymin"] / cell),
                    F.floor(env["ymax"] / cell))
    return F.flatten(F.transform(
        cx, lambda x: F.transform(cy, lambda y: F.struct(
            x.alias("cx"), y.alias("cy")))))


def bbox_join(left: DataFrame, right: DataFrame,
              left_geom: str = "geom", right_geom: str = "geom",
              cell: float = 1.0,
              suffixes: tuple[str, str] = ("_l", "_r")) -> DataFrame:
    """Envelope-intersects join (exact for points; the standard
    conservative filter for edge geometries — chain an exact predicate
    downstream if you need more than envelopes).

    One equi-join on grid-cell keys; duplicate candidates are removed by
    the reference-point rule (no distinct()). Output carries every
    column of both inputs, name collisions suffixed."""
    if cell <= 0:
        raise ValueError(f"cell size must be positive: {cell}")

    def prep(df: DataFrame, geom: str, side: str) -> DataFrame:
        e = f"_env{side}"
        out = with_envelope(df, geom, e).filter(F.col(e).isNotNull())
        return out.withColumn(f"_cell{side}",
                              F.explode(_cells(F.col(e), cell)))

    overlap = set(left.columns) & set(right.columns)
    lt = prep(left, left_geom, "_l")
    rt = prep(right, right_geom, "_r")
    for c in overlap:
        lt = lt.withColumnRenamed(c, c + suffixes[0])
        rt = rt.withColumnRenamed(c, c + suffixes[1])
    le, re = F.col("_env_l"), F.col("_env_r")
    lc, rc = F.col("_cell_l"), F.col("_cell_r")
    boxes_hit = ((le["xmin"] <= re["xmax"]) & (le["xmax"] >= re["xmin"])
                 & (le["ymin"] <= re["ymax"]) & (le["ymax"] >= re["ymin"]))
    # reference point: the intersection box's lower-left corner — it
    # lies in exactly ONE grid cell, so each matching pair survives in
    # exactly one of the cells it co-occurs in (no distinct needed)
    ref_ok = ((F.floor(F.greatest(le["xmin"], re["xmin"]) / cell)
               == lc["cx"])
              & (F.floor(F.greatest(le["ymin"], re["ymin"]) / cell)
                 == lc["cy"]))
    joined = lt.join(rt, (lc["cx"] == rc["cx"]) & (lc["cy"] == rc["cy"]))
    return (joined.filter(boxes_hit & ref_ok)
            .drop("_env_l", "_env_r", "_cell_l", "_cell_r"))


def bbox_filter(df: DataFrame, bbox: tuple, geom_col: str = "geom") -> DataFrame:
    """Rows whose geometry envelope intersects ``bbox`` — the DataFrame-
    level sibling of the ``st_intersects`` scan predicate (which also
    prunes files; use that when reading an IceTable)."""
    xmin, ymin, xmax, ymax = (float(v) for v in bbox)
    e = "_env_f"
    out = with_envelope(df, geom_col, e)
    env = F.col(e)
    return out.filter(env.isNotNull()
                      & (env["xmin"] <= xmax) & (env["xmax"] >= xmin)
                      & (env["ymin"] <= ymax) & (env["ymax"] >= ymin)
                      ).drop(e)


def _exact_pair_udf():
    """Arrow-batched exact intersects over (left_wkb, right_wkb) pairs.

    The batch is GROUPED by the right-side region bytes and each group
    runs through ``geom.intersects_exact_mask`` — the same vectorized
    kernel the scan filter uses: the region parses once per (batch,
    region), and point lefts (the overwhelmingly common case) take a
    numpy crossing-number test over the whole group with NO per-row
    Python; only non-point lefts pay the per-row edge/vertex kernel."""
    import numpy as np
    import pandas as pd
    from pyspark.sql.functions import pandas_udf

    from iceberg_cpp_spark.core import geom

    def hit(l_vals, r_vals):
        n = len(l_vals)
        res = np.full(n, None, dtype=object)
        lv = l_vals.to_numpy()
        valid = l_vals.notna().to_numpy() & r_vals.notna().to_numpy()
        if valid.any():
            keys = pd.Series(
                [bytes(v) if ok else None
                 for v, ok in zip(r_vals.to_numpy(), valid)])
            for region, pos in keys[valid].groupby(
                    keys[valid], sort=False).groups.items():
                idx = np.asarray(pos)
                mask = geom.intersects_exact_mask(
                    [lv[i] for i in idx], region)
                res[idx] = mask.astype(object)
        return pd.Series(res, dtype="boolean")

    hit.__annotations__ = {"l_vals": pd.Series, "r_vals": pd.Series,
                           "return": pd.Series}
    return pandas_udf(hit, "boolean")


def pip_join(points: DataFrame, regions: DataFrame,
             points_geom: str = "geom", regions_geom: str = "geom",
             cell: float = 1.0,
             suffixes: tuple[str, str] = ("_l", "_r")) -> DataFrame:
    """EXACT point/geometry-in-polygon join: candidates meet through
    the grid-bucketed envelope join (never a cartesian), then each
    surviving pair is verified with the exact boundary-inclusive
    kernel (core/geom.py — PostGIS ST_Intersects semantics). The
    region side must be POLYGON/MULTIPOLYGON WKB.

    Scale: the envelope join bounds the candidate set; the exact pass
    groups each Arrow batch by region and runs the vectorized
    crossing-number kernel over the group's point array (regions parse
    once per (batch, region); only non-point lefts pay per-row math)."""
    gl = points_geom + suffixes[0] if points_geom == regions_geom \
        else points_geom
    gr = regions_geom + suffixes[1] if points_geom == regions_geom \
        else regions_geom
    cand = bbox_join(points, regions, points_geom, regions_geom,
                     cell=cell, suffixes=suffixes)
    return cand.filter(_exact_pair_udf()(F.col(gl), F.col(gr)))

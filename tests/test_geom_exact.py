"""Exact st_intersects (core/geom.py — VERDICT r10 task 3).

Golden values follow PostGIS ``ST_Intersects`` semantics
(boundary-inclusive, even-odd holes): every case below was chosen so
the expected value is unambiguous under the OGC definition — vertex
and edge touches intersect, points inside a hole do not, crossings
without contained vertices do.
"""

import struct

import numpy as np
import pytest
from pyspark.sql import functions as F

import iceberg_cpp_spark.core.types as it
from iceberg_cpp_spark.core import geom, wkb


def line_wkb(coords):
    return (struct.pack("<BII", 1, wkb.LINESTRING, len(coords))
            + b"".join(struct.pack("<dd", x, y) for x, y in coords))


SQUARE = geom.polygon_wkb([(0, 0), (10, 0), (10, 10), (0, 10)])
TRIANGLE = geom.polygon_wkb([(0, 0), (10, 0), (0, 10)])
DONUT = geom.polygon_wkb([(0, 0), (10, 0), (10, 10), (0, 10)],
                         holes=[[(3, 3), (7, 3), (7, 7), (3, 7)]])


class TestPointGolden:
    """ST_Intersects(point, polygon) golden matrix."""

    @pytest.mark.parametrize("pt,poly,expect", [
        ((4, 4), TRIANGLE, True),      # interior
        ((6, 6), TRIANGLE, False),     # inside bbox, outside triangle
        ((5, 5), TRIANGLE, True),      # on hypotenuse (boundary)
        ((0, 0), TRIANGLE, True),      # vertex
        ((10, 0), TRIANGLE, True),     # vertex
        ((-1, -1), TRIANGLE, False),
        ((5, 0), SQUARE, True),        # on edge
        ((5, 5), DONUT, False),        # in the hole
        ((3, 5), DONUT, True),         # on hole boundary
        ((1, 1), DONUT, True),         # in the ring
        ((8, 8), DONUT, True),
    ])
    def test_point_cases(self, pt, poly, expect):
        polys = geom.parse_query_polygons(poly)
        got = geom.points_in_polygons(
            np.array([pt[0]], float), np.array([pt[1]], float), polys)[0]
        assert bool(got) is expect
        # the per-row kernel must agree with the vectorized one
        assert geom.wkb_intersects_polygons(
            wkb.point_wkb(*pt), polys) is expect


class TestLinePolygonGolden:
    @pytest.mark.parametrize("coords,expect", [
        ([(-5, 5), (15, 5)], True),    # crosses, no vertex inside
        ([(-5, 15), (15, 15)], False),  # passes above
        ([(2, 2), (8, 8)], True),      # fully inside
        ([(-5, -5), (0, 0)], True),    # touches corner only
        ([(-5, 0), (-1, 8)], False),   # left of the square
        ([(0, -5), (0, 15)], True),    # collinear with the left edge
    ])
    def test_line_cases(self, coords, expect):
        polys = geom.parse_query_polygons(SQUARE)
        assert geom.wkb_intersects_polygons(line_wkb(coords), polys) is expect


class TestPolygonPolygonGolden:
    @pytest.mark.parametrize("poly,expect", [
        (geom.polygon_wkb([(4, -2), (6, -2), (6, 12), (4, 12)]), True),
        # plus-shape crossing: no vertex of either inside the other
        (geom.polygon_wkb([(-100, -100), (100, -100), (100, 100),
                           (-100, 100)]), True),   # contains the query
        (geom.polygon_wkb([(2, 2), (3, 2), (3, 3), (2, 3)]), True),
        # contained by the query
        (geom.polygon_wkb([(50, 50), (60, 50), (60, 60), (50, 60)]), False),
        (geom.polygon_wkb([(10, 10), (12, 10), (12, 12), (10, 12)]), True),
        # corner touch
        (geom.polygon_wkb([(4, 4), (6, 4), (6, 6), (4, 6)]), True),
        # inside the DONUT hole but vs SQUARE: plain inside
    ])
    def test_polygon_cases(self, poly, expect):
        polys = geom.parse_query_polygons(SQUARE)
        assert geom.wkb_intersects_polygons(poly, polys) is expect

    def test_polygon_inside_hole_is_disjoint(self):
        polys = geom.parse_query_polygons(DONUT)
        inner = geom.polygon_wkb([(4, 4), (6, 4), (6, 6), (4, 6)])
        assert geom.wkb_intersects_polygons(inner, polys) is False
        # but one that bridges the hole boundary intersects
        bridge = geom.polygon_wkb([(4, 4), (8, 4), (8, 6), (4, 6)])
        assert geom.wkb_intersects_polygons(bridge, polys) is True


class TestMultiAndBatch:
    def test_multipolygon_query(self):
        two = (struct.pack("<BII", 1, wkb.MULTIPOLYGON, 2)
               + geom.polygon_wkb([(0, 0), (1, 0), (1, 1), (0, 1)])
               + geom.polygon_wkb([(5, 5), (6, 5), (6, 6), (5, 6)]))
        polys = geom.parse_query_polygons(two)
        got = geom.points_in_polygons(
            np.array([0.5, 5.5, 3.0]), np.array([0.5, 5.5, 3.0]), polys)
        assert got.tolist() == [True, True, False]

    def test_batch_mask_mixed(self):
        vals = [wkb.point_wkb(4, 4), None, wkb.point_wkb(20, 20),
                line_wkb([(-5, 5), (15, 5)]), SQUARE]
        mask = geom.intersects_exact_mask(vals, SQUARE)
        assert mask.tolist() == [True, False, False, True, True]

    def test_non_areal_query_rejected(self):
        with pytest.raises(ValueError):
            geom.parse_query_polygons(wkb.point_wkb(1, 2))


class TestExactScanPredicate:
    def test_exact_vs_envelope_on_ice_table(self, spark, tmp_loc):
        """End-to-end: an IceTable scan with a WKB-polygon
        st_intersects literal returns EXACT results that differ from
        the envelope answer, while file pruning still runs on the
        polygon's envelope."""
        import os

        from iceberg_cpp_spark import IceTable
        from iceberg_cpp_spark.plans import expressions as ex

        # integer-lattice points: (x, y) in [-20, 19]^2; WKB built
        # driver-side (test-scale) — production rows use the
        # vectorized _geo_point_udf pattern
        rows = [(i, float(i % 40 - 20), float((i * 7) % 40 - 20))
                for i in range(400)]
        pts = spark.createDataFrame(
            [(i, x, y, wkb.point_wkb(x, y)) for i, x, y in rows],
            "id long, x double, y double, geom binary")
        sch = it.Schema([
            it.NestedField(1, "id", it.LongType(), True),
            it.NestedField(2, "x", it.DoubleType(), False),
            it.NestedField(3, "y", it.DoubleType(), False),
            it.NestedField(4, "geom", it.GeometryType(), False),
        ])
        t = IceTable.create(spark, os.path.join(tmp_loc, "tgeo"), sch,
                            properties={"format-version": "3"})
        t = t.append(pts.repartitionByRange(4, "x"))
        tri = geom.polygon_wkb([(-10, -10), (10, -10), (-10, 10)])
        exact = t.scan(filter=ex.st_intersects(ex.Reference("geom"), tri))
        got = {r["id"] for r in exact.to_df().select("id").collect()}
        expect = {i for i, x, y in rows
                  if y >= -10 and x >= -10 and x + y <= 0}
        assert got == expect
        # the envelope answer over the same bbox is strictly larger
        env = t.scan(filter=ex.st_intersects(ex.Reference("geom"),
                                             (-10.0, -10.0, 10.0, 10.0)))
        assert env.to_df().count() > len(expect)
        # pruning front end: a far-away polygon plans zero files
        far = geom.polygon_wkb([(900, 900), (910, 900), (900, 910)])
        assert not list(t.scan(
            filter=ex.st_intersects(ex.Reference("geom"), far))
            .plan_files())
        # exact disjoint = complement on non-null rows
        disj = t.scan(filter=ex.st_disjoint(ex.Reference("geom"), tri))
        assert disj.to_df().count() == 400 - len(expect)

    def test_bound_predicate_test_path(self):
        """BoundPredicate.test (metrics evaluator / tests path) also
        honors exact literals."""
        sch = it.Schema([
            it.NestedField(1, "g", it.GeometryType(), False)])
        tri = geom.polygon_wkb([(0, 0), (10, 0), (0, 10)])
        from iceberg_cpp_spark.plans import expressions as ex

        bound = ex.st_intersects(ex.Reference("g"), tri).bind(sch)
        assert bound.test(wkb.point_wkb(4, 4)) is True
        assert bound.test(wkb.point_wkb(6, 6)) is False  # bbox-only = True
        assert bound.test(wkb.point_wkb(5, 5)) is True   # boundary


class TestRandomizedCrossCheck:
    """Property-style sweep: the vectorized crossing-number kernel vs an
    INDEPENDENT scalar reference (different formulation — signed
    half-plane walk with explicit on-segment checks) over random
    integer-lattice points and polygons. Integer coordinates keep every
    orientation test exact in float64, so the two implementations must
    agree bit-for-bit, boundary rows included."""

    @staticmethod
    def _ref_point_in_polygon(px, py, rings):
        # independent reference: per-ring even-odd via explicit edge
        # walk, written against the textbook description (not shared
        # with core/geom.py)
        def on_seg(x1, y1, x2, y2):
            if (x2 - x1) * (py - y1) != (y2 - y1) * (px - x1):
                return False
            return (min(x1, x2) <= px <= max(x1, x2)
                    and min(y1, y2) <= py <= max(y1, y2))

        inside = False
        for ring in rings:
            pts = [(float(x), float(y)) for x, y in ring]
            if pts[0] != pts[-1]:
                pts.append(pts[0])
            for (x1, y1), (x2, y2) in zip(pts, pts[1:]):
                if on_seg(x1, y1, x2, y2):
                    return True
                if (y1 <= py < y2) or (y2 <= py < y1):
                    t = (py - y1) / (y2 - y1)
                    if px < x1 + t * (x2 - x1):
                        inside = not inside
        return inside

    def test_random_lattice_agreement(self):
        import random

        rng = random.Random(20260815)
        for trial in range(30):
            # random simple-ish polygon: convex hull of random lattice
            # points (hull => simple, non-degenerate)
            raw = {(rng.randint(-15, 15), rng.randint(-15, 15))
                   for _ in range(rng.randint(4, 12))}
            pts = sorted(raw)
            if len(pts) < 3:
                continue

            def cross(o, a, b):
                return ((a[0] - o[0]) * (b[1] - o[1])
                        - (a[1] - o[1]) * (b[0] - o[0]))

            lower, upper = [], []
            for p in pts:
                while len(lower) >= 2 and cross(lower[-2], lower[-1], p) <= 0:
                    lower.pop()
                lower.append(p)
            for p in reversed(pts):
                while len(upper) >= 2 and cross(upper[-2], upper[-1], p) <= 0:
                    upper.pop()
                upper.append(p)
            hull = lower[:-1] + upper[:-1]
            if len(hull) < 3:
                continue
            poly = geom.polygon_wkb([(float(x), float(y)) for x, y in hull])
            polys = geom.parse_query_polygons(poly)
            qx = np.array([rng.randint(-20, 20) for _ in range(200)], float)
            qy = np.array([rng.randint(-20, 20) for _ in range(200)], float)
            got = geom.points_in_polygons(qx, qy, polys)
            rings = [np.array([[float(x), float(y)] for x, y in hull])]
            for i in range(len(qx)):
                want = self._ref_point_in_polygon(qx[i], qy[i], rings)
                assert bool(got[i]) == want, (
                    f"trial {trial}: point ({qx[i]},{qy[i]}) vs hull "
                    f"{hull}: kernel={bool(got[i])} reference={want}")
            # batch entry agrees with the point kernel
            vals = [wkb.point_wkb(float(x), float(y))
                    for x, y in zip(qx, qy)]
            mask = geom.intersects_exact_mask(vals, poly)
            assert mask.tolist() == got.tolist()

"""Iceberg v3 geometry / geography types.

The reference pins its type enum at v2 ("Iceberg V3 types are not
currently supported", type_fwd.h:34); this engine exceeds both
geospatial slots: values ride as engine-tagged BinaryType WKB, per-file
bounds are the spec's WKB points (lower=(xmin,ymin), upper=(xmax,ymax),
geography x may wrap the antimeridian), ``st_intersects``/
``st_disjoint`` prune files through those bounds and filter rows via an
Arrow-batched envelope test, and ordered comparisons / partition / sort
/ equality-delete / z-order uses are fenced loudly.

Golden WKB vectors come from the OGC 06-103r4 examples as rendered by
PostGIS (``SELECT ST_AsBinary(...)``) — hard-coded hex, not produced by
the code under test.
"""
import math
import struct

import pytest
from pyspark.sql import functions as F

from iceberg_cpp_spark import IceTable
from iceberg_cpp_spark.core import types as it
from iceberg_cpp_spark.core import wkb
from iceberg_cpp_spark.core.literals import from_bytes, to_bytes
from iceberg_cpp_spark.core.metadata import PartitionField, PartitionSpec
from iceberg_cpp_spark.functions import transforms as tr
from iceberg_cpp_spark.plans import expressions as ex
from iceberg_cpp_spark.plans.pruning import InclusiveMetricsEvaluator

# PostGIS: SELECT ST_AsBinary('POINT(1 2)'::geometry)
_POINT_1_2 = bytes.fromhex(
    "0101000000000000000000f03f0000000000000040")
# PostGIS: SELECT ST_AsBinary('LINESTRING(0 0, 10 5)'::geometry)
_LINE_0_0_10_5 = bytes.fromhex(
    "010200000002000000000000000000000000000000000000000000000000002440"
    "0000000000001440")
# PostGIS: SELECT ST_AsBinary(
#   'POLYGON((0 0, 4 0, 4 4, 0 4, 0 0),(1 1, 2 1, 2 2, 1 2, 1 1))')
_POLY_HOLE = bytes.fromhex(
    "01030000000200000005000000000000000000000000000000000000000000000000"
    "001040000000000000000000000000000010400000000000001040000000000000000"
    "000000000000010400000000000000000000000000000000005000000000000000000"
    "f03f000000000000f03f0000000000000040000000000000f03f00000000000000400"
    "000000000000040000000000000f03f0000000000000040000000000000f03f000000"
    "000000f03f")
# PostGIS: SELECT ST_AsBinary('MULTIPOINT((3 7),(-1 2))'::geometry)
_MPOINT = bytes.fromhex(
    "0104000000020000000101000000000000000000084000000000000"
    "01c400101000000000000000000f0bf0000000000000040")


def _pt(x, y):
    return wkb.point_wkb(x, y)


def _geo_pts(lon, lat):
    """(lon, lat) Columns -> WKB point Column (test helper; Arrow-batched)."""
    import numpy as np
    import pandas as pd
    from pyspark.sql.functions import pandas_udf

    header = np.frombuffer(wkb.point_wkb(0.0, 0.0)[:5], dtype=np.uint8)

    def to_wkb(x, y):
        n = len(x)
        arr = np.empty((n, 21), dtype=np.uint8)
        arr[:, :5] = header
        arr[:, 5:13] = np.ascontiguousarray(
            x.to_numpy(np.float64)).view(np.uint8).reshape(n, 8)
        arr[:, 13:21] = np.ascontiguousarray(
            y.to_numpy(np.float64)).view(np.uint8).reshape(n, 8)
        b = arr.tobytes()
        return pd.Series([b[i * 21:(i + 1) * 21] for i in range(n)])

    to_wkb.__annotations__ = {'x': pd.Series, 'y': pd.Series,
                              'return': pd.Series}
    return pandas_udf(to_wkb, 'binary')(lon, lat)


class TestWkb:
    def test_point_golden(self):
        assert wkb.point_wkb(1.0, 2.0) == _POINT_1_2
        assert wkb.parse_point(_POINT_1_2) == (1.0, 2.0)
        assert wkb.envelope(_POINT_1_2) == (1.0, 2.0, 1.0, 2.0)

    def test_linestring_polygon_multipoint(self):
        assert wkb.envelope(_LINE_0_0_10_5) == (0.0, 0.0, 10.0, 5.0)
        assert wkb.envelope(_POLY_HOLE) == (0.0, 0.0, 4.0, 4.0)
        assert wkb.envelope(_MPOINT) == (-1.0, 2.0, 3.0, 7.0)

    def test_big_endian(self):
        be = struct.pack(">BIdd", 0, wkb.POINT, 5.0, -3.0)
        assert wkb.envelope(be) == (5.0, -3.0, 5.0, -3.0)
        assert wkb.parse_point(be) == (5.0, -3.0)

    def test_z_and_ewkb_forms(self):
        # ISO Z point (code 1001): z ignored for the x/y envelope
        isoz = struct.pack("<BIddd", 1, 1001, 1.0, 2.0, 9.0)
        assert wkb.envelope(isoz) == (1.0, 2.0, 1.0, 2.0)
        # EWKB Z|SRID point (PostGIS ST_AsEWKB shape)
        code = wkb.POINT | 0x80000000 | 0x20000000
        ewkb = struct.pack("<BIIddd", 1, code, 4326, 1.0, 2.0, 9.0)
        assert wkb.envelope(ewkb) == (1.0, 2.0, 1.0, 2.0)

    def test_empty_point_is_empty(self):
        empty = struct.pack("<BIdd", 1, wkb.POINT,
                            float("nan"), float("nan"))
        assert wkb.envelope(empty) is None

    def test_geometrycollection(self):
        coll = (struct.pack("<BII", 1, wkb.GEOMETRYCOLLECTION, 2)
                + _POINT_1_2 + _LINE_0_0_10_5)
        assert wkb.envelope(coll) == (0.0, 0.0, 10.0, 5.0)

    def test_envelopes_np_fast_path_matches_generic(self):
        vals = [_pt(1, 2), None, _pt(-5, 3), _pt(0, 0)]
        envs = wkb.envelopes_np(vals)
        assert envs.shape == (4, 4)
        assert list(envs[0]) == [1, 2, 1, 2]
        assert all(math.isnan(v) for v in envs[1])
        assert list(envs[2]) == [-5, 3, -5, 3]
        # mixed batch (forces the generic path) must agree
        mixed = vals + [_LINE_0_0_10_5]
        envs2 = wkb.envelopes_np(mixed)
        assert list(envs2[0]) == [1, 2, 1, 2]
        assert list(envs2[4]) == [0, 0, 10, 5]

    def test_intersects_mask(self):
        envs = wkb.envelopes_np([_pt(1, 1), _pt(10, 10), None])
        mask = wkb.intersects_mask(envs, (0, 0, 5, 5))
        assert list(mask) == [True, False, False]

    def test_file_bounds_wraparound(self):
        # geography file spanning the antimeridian: x in [170, -170]
        lo, hi = _pt(170.0, -10.0), _pt(-170.0, 10.0)
        assert wkb.file_bounds_intersect(lo, hi, (175.0, -5.0, 179.0, 5.0))
        assert wkb.file_bounds_intersect(lo, hi, (-179.0, -5.0, -175.0, 5.0))
        assert not wkb.file_bounds_intersect(lo, hi, (-5.0, -5.0, 5.0, 5.0))
        assert not wkb.file_bounds_intersect(lo, hi, (175.0, 20.0, 179.0, 30.0))


class TestGeoTypes:
    def test_json_serde(self):
        g = it.type_from_json("geometry")
        assert isinstance(g, it.GeometryType) and g.crs == "OGC:CRS84"
        assert g.to_json() == "geometry"
        g2 = it.type_from_json("geometry(EPSG:3857)")
        assert g2.crs == "EPSG:3857"
        assert g2.to_json() == "geometry(EPSG:3857)"
        gg = it.type_from_json("geography")
        assert isinstance(gg, it.GeographyType)
        assert (gg.crs, gg.algorithm) == ("OGC:CRS84", "spherical")
        assert gg.to_json() == "geography"
        gg2 = it.type_from_json("geography(EPSG:4326, vincenty)")
        assert (gg2.crs, gg2.algorithm) == ("EPSG:4326", "vincenty")
        assert gg2.to_json() == "geography(EPSG:4326, vincenty)"
        assert it.type_from_json("geography(EPSG:4326)").algorithm == "spherical"

    def test_spark_mapping_is_tagged_binary(self):
        sch = it.Schema([it.NestedField(1, "g", it.GeometryType(), False)])
        sf = it.to_spark_schema(sch).fields[0]
        assert sf.dataType.typeName() == "binary"
        assert sf.metadata[it.ENGINE_TYPE_KEY] == "geometry"

    def test_single_value_serde_is_wkb_passthrough(self):
        t = it.GeometryType()
        assert to_bytes(_POINT_1_2, t) == _POINT_1_2
        assert from_bytes(_POINT_1_2, t) == _POINT_1_2

    def test_v3_gate(self, spark, tmp_loc):
        sch = it.Schema([it.NestedField(1, "g", it.GeometryType(), False)])
        with pytest.raises(ValueError, match="format-version 3"):
            IceTable.create(spark, f"{tmp_loc}/bad", sch)


class TestGeoBinding:
    SCH = it.Schema([
        it.NestedField(1, "id", it.LongType(), True),
        it.NestedField(2, "g", it.GeometryType(), False),
        it.NestedField(3, "gg", it.GeographyType(), False),
    ])

    def test_st_ops_bind_to_geo_only(self):
        b = ex.st_intersects(ex.Reference("g"), (0, 0, 1, 1)).bind(self.SCH)
        assert b.op == ex.Op.ST_INTERSECTS
        with pytest.raises(ValueError, match="geometry/geography"):
            ex.st_intersects(ex.Reference("id"), (0, 0, 1, 1)).bind(self.SCH)

    def test_comparisons_on_geo_raise(self):
        for pred in (ex.eq(ex.Reference("g"), b"x"),
                     ex.lt(ex.Reference("g"), b"x"),
                     ex.in_(ex.Reference("g"), [b"x"])):
            with pytest.raises(ValueError, match="no total order"):
                pred.bind(self.SCH)
        # null checks stay valid
        assert ex.is_null(ex.Reference("g")).bind(self.SCH).op == ex.Op.IS_NULL

    def test_degenerate_box_raises(self):
        with pytest.raises(ValueError, match="degenerate"):
            ex.st_intersects(ex.Reference("g"), (2, 0, 1, 1)).bind(self.SCH)
        with pytest.raises(ValueError, match="box"):
            ex.st_intersects(ex.Reference("g"), None).bind(self.SCH)

    def test_negation(self):
        p = ex.st_intersects(ex.Reference("g"), (0, 0, 1, 1))
        assert p.negate().op == ex.Op.ST_DISJOINT
        b = p.bind(self.SCH)
        assert b.negate().op == ex.Op.ST_DISJOINT

    def test_row_test_semantics(self):
        b = ex.st_intersects(ex.Reference("g"), (0, 0, 5, 5)).bind(self.SCH)
        assert b.test(_pt(1, 1))
        assert not b.test(_pt(9, 9))
        assert not b.test(None)
        assert b.negate().test(_pt(9, 9))
        # empty geometry intersects nothing
        empty = struct.pack("<BIdd", 1, wkb.POINT,
                            float("nan"), float("nan"))
        assert not b.test(empty)
        assert b.negate().test(empty)

    def test_file_level_evaluator(self):
        stats = {
            "record_count": 10,
            "value_counts": {2: 10}, "null_value_counts": {2: 0},
            "nan_value_counts": {},
            "lower_bounds": {2: _pt(0, 0)}, "upper_bounds": {2: _pt(4, 4)},
        }
        hit = ex.st_intersects(ex.Reference("g"), (3, 3, 9, 9))
        miss = ex.st_intersects(ex.Reference("g"), (5, 5, 9, 9))
        assert InclusiveMetricsEvaluator(self.SCH, hit).eval(stats)
        assert not InclusiveMetricsEvaluator(self.SCH, miss).eval(stats)
        # disjoint: prunable only when the file box is inside the query box
        inside = ex.st_disjoint(ex.Reference("g"), (-1, -1, 5, 5))
        partial = ex.st_disjoint(ex.Reference("g"), (2, 2, 9, 9))
        assert not InclusiveMetricsEvaluator(self.SCH, inside).eval(stats)
        assert InclusiveMetricsEvaluator(self.SCH, partial).eval(stats)
        # wrapped geography bounds stay conservative for intersects
        wrapped = dict(stats)
        wrapped["lower_bounds"] = {2: _pt(170, -10)}
        wrapped["upper_bounds"] = {2: _pt(-170, 10)}
        q = ex.st_intersects(ex.Reference("g"), (175, -5, 179, 5))
        assert InclusiveMetricsEvaluator(self.SCH, q).eval(wrapped)
        q2 = ex.st_intersects(ex.Reference("g"), (-5, -5, 5, 5))
        assert not InclusiveMetricsEvaluator(self.SCH, q2).eval(wrapped)


class TestGeoTable:
    def _table(self, spark, loc, pts):
        sch = it.Schema([
            it.NestedField(1, "id", it.LongType(), True),
            it.NestedField(2, "geom", it.GeometryType(), False),
        ])
        t = IceTable.create(spark, loc, sch,
                            properties={"format-version": "3"})
        rows = [(i, _pt(float(x), float(y))) for i, (x, y) in enumerate(pts)]
        df = spark.createDataFrame(rows, "id long, geom binary")
        return t.append(df.coalesce(1))

    def test_roundtrip_and_row_filter(self, spark, tmp_loc):
        pts = [(0, 0), (1, 1), (10, 10), (50, 5), (-3, -3)]
        t = self._table(spark, f"{tmp_loc}/t", pts)
        assert t.to_df().count() == 5
        got = (t.scan(filter=ex.st_intersects(ex.Reference("geom"),
                                              (-1, -1, 2, 2)))
               .to_df().select("id").orderBy("id").collect())
        assert [r["id"] for r in got] == [0, 1]
        got2 = (t.scan(filter=ex.st_disjoint(ex.Reference("geom"),
                                             (-1, -1, 2, 2)))
                .to_df().select("id").collect())
        assert sorted(r["id"] for r in got2) == [2, 3, 4]

    def test_bounds_are_wkb_points_and_files_prune(self, spark, tmp_loc):
        # two appends with disjoint x-ranges -> two files with envelopes
        t = self._table(spark, f"{tmp_loc}/t",
                        [(0, 0), (4, 4)])         # file A: x in [0, 4]
        df = spark.createDataFrame(
            [(10, _pt(100.0, 1.0)), (11, _pt(104.0, 3.0))],
            "id long, geom binary")
        t = t.append(df.coalesce(1))               # file B: x in [100, 104]
        import iceberg_cpp_spark.core.manifests as mf

        snap = t.current_snapshot()
        entries = [e for m in mf.read_manifest_list(snap.manifest_list)
                   for e in mf.read_manifest(m.manifest_path, t.spec(),
                                             t.schema(), manifest=m)]
        assert len(entries) == 2
        for e in entries:
            lo = e.data_file.lower_bounds[2]
            hi = e.data_file.upper_bounds[2]
            lx, ly = wkb.parse_point(lo)
            ux, uy = wkb.parse_point(hi)
            assert lx <= ux and ly <= uy
        tasks = t.scan(filter=ex.st_intersects(
            ex.Reference("geom"), (99.0, 0.0, 105.0, 5.0))).plan_files()
        assert len(tasks) == 1
        got = (t.scan(filter=ex.st_intersects(
            ex.Reference("geom"), (99.0, 0.0, 105.0, 5.0)))
            .to_df().select("id").collect())
        assert sorted(r["id"] for r in got) == [10, 11]

    def test_null_geoms_and_all_null_file(self, spark, tmp_loc):
        sch = it.Schema([
            it.NestedField(1, "id", it.LongType(), True),
            it.NestedField(2, "geom", it.GeometryType(), False),
        ])
        t = IceTable.create(spark, f"{tmp_loc}/t", sch,
                            properties={"format-version": "3"})
        df = spark.createDataFrame([(0, None), (1, None)],
                                   "id long, geom binary")
        t = t.append(df.coalesce(1))
        import iceberg_cpp_spark.core.manifests as mf

        snap = t.current_snapshot()
        e = [e for m in mf.read_manifest_list(snap.manifest_list)
             for e in mf.read_manifest(m.manifest_path, t.spec(),
                                       t.schema(), manifest=m)][0]
        assert 2 not in e.data_file.lower_bounds  # no bounds, counts only
        assert e.data_file.null_value_counts.get(2) == 2
        # all-null file prunes for intersects
        assert t.scan(filter=ex.st_intersects(
            ex.Reference("geom"), (0, 0, 1, 1))).plan_files() == []

    def test_fences(self, spark, tmp_loc):
        t = self._table(spark, f"{tmp_loc}/t", [(0, 0)])
        with pytest.raises(ValueError, match="partition source"):
            t.update_spec([PartitionField(2, 0, "p", tr.IDENTITY)])
        keys = spark.createDataFrame([(_pt(0, 0),)], "geom binary")
        with pytest.raises(ValueError, match="equality-delete key"):
            t.delete_by_keys(keys)
        with pytest.raises(ValueError, match="z-order"):
            t.rewrite_data_files(zorder_by=["geom"])

    def test_geo_survives_cow_delete_and_compaction(self, spark, tmp_loc):
        t = self._table(spark, f"{tmp_loc}/t",
                        [(0, 0), (1, 1), (2, 2), (3, 3)])
        t = t.delete_where(ex.eq(ex.Reference("id"), 1))
        t = t.rewrite_data_files(target_file_count=1)
        got = (t.scan(filter=ex.st_intersects(ex.Reference("geom"),
                                              (1.5, 1.5, 9.0, 9.0)))
               .to_df().select("id").collect())
        assert sorted(r["id"] for r in got) == [2, 3]


class TestSpatialJoin:
    """operators/spatial.py — grid-bucketed envelope join (no cartesian,
    no distinct: reference-point dedup)."""

    def _line(self, x1, y1, x2, y2):
        # 2-point linestring: its envelope is the (x1,y1)-(x2,y2) box
        return (struct.pack("<BII", 1, wkb.LINESTRING, 2)
                + struct.pack("<dddd", x1, y1, x2, y2))

    def test_points_to_boxes(self, spark):
        from iceberg_cpp_spark.operators import spatial

        pts = spark.createDataFrame(
            [(i, _pt(float(i), 0.5)) for i in range(10)],
            "pid long, geom binary")
        boxes = spark.createDataFrame(
            [(0, self._line(1.5, 0.0, 4.5, 1.0)),
             (1, self._line(8.0, 0.0, 9.0, 1.0)),
             (2, self._line(20.0, 0.0, 30.0, 1.0))],
            "bid long, geom binary")
        got = spatial.bbox_join(pts, boxes, cell=1.0)
        pairs = sorted((r["pid"], r["bid"])
                       for r in got.select("pid", "bid").collect())
        assert pairs == [(2, 0), (3, 0), (4, 0), (8, 1), (9, 1)]

    def test_multi_cell_pair_emitted_once(self, spark):
        from iceberg_cpp_spark.operators import spatial

        # two big overlapping boxes co-occur in MANY cells; the
        # reference-point rule must emit the pair exactly once
        a = spark.createDataFrame(
            [(0, self._line(0.0, 0.0, 5.0, 5.0))], "aid long, geom binary")
        b = spark.createDataFrame(
            [(0, self._line(1.0, 1.0, 7.0, 7.0)),
             (1, self._line(5.5, 0.0, 9.0, 4.0))], "bid long, geom binary")
        got = spatial.bbox_join(a, b, cell=1.0)
        pairs = [(r["aid"], r["bid"])
                 for r in got.select("aid", "bid").collect()]
        assert sorted(pairs) == [(0, 0)]  # (0,1) boxes don't intersect

    def test_nulls_and_empties_drop(self, spark):
        from iceberg_cpp_spark.operators import spatial

        empty = struct.pack("<BIdd", 1, wkb.POINT,
                            float("nan"), float("nan"))
        pts = spark.createDataFrame(
            [(0, _pt(1.0, 1.0)), (1, None), (2, empty)],
            "pid long, geom binary")
        boxes = spark.createDataFrame(
            [(0, self._line(0.0, 0.0, 2.0, 2.0))], "bid long, geom binary")
        got = spatial.bbox_join(pts, boxes, cell=1.0)
        assert [r["pid"] for r in got.select("pid").collect()] == [0]

    def test_negative_coords_and_cell_size(self, spark):
        from iceberg_cpp_spark.operators import spatial

        # floor-based cells must be correct across the origin
        pts = spark.createDataFrame(
            [(0, _pt(-0.5, -0.5)), (1, _pt(-3.0, -3.0))],
            "pid long, geom binary")
        boxes = spark.createDataFrame(
            [(0, self._line(-1.0, -1.0, 0.0, 0.0))], "bid long, geom binary")
        got = spatial.bbox_join(pts, boxes, cell=2.5)
        assert [r["pid"] for r in got.select("pid").collect()] == [0]
        with pytest.raises(ValueError, match="cell size"):
            spatial.bbox_join(pts, boxes, cell=0.0)

    def test_bbox_filter_matches_scan_semantics(self, spark):
        from iceberg_cpp_spark.operators import spatial

        pts = spark.createDataFrame(
            [(i, _pt(float(i), float(i))) for i in range(6)],
            "pid long, geom binary")
        got = spatial.bbox_filter(pts, (1.0, 1.0, 3.0, 3.0))
        assert sorted(r["pid"] for r in got.collect()) == [1, 2, 3]


class TestWkbProperties:
    """Property pins: the vectorized fast path and the generic parser
    must agree, and envelopes must equal plain numpy min/max."""

    def test_random_point_envelopes_match_minmax(self):
        from hypothesis import given, settings
        from hypothesis import strategies as st

        finite = st.floats(allow_nan=False, allow_infinity=False,
                           width=64, min_value=-1e15, max_value=1e15)

        @settings(max_examples=200, deadline=None)
        @given(st.lists(st.tuples(finite, finite), min_size=1, max_size=40))
        def check(pts):
            import numpy as np

            vals = [_pt(x, y) for x, y in pts]
            envs = wkb.envelopes_np(vals)
            xs = np.array([x for x, _ in pts])
            ys = np.array([y for _, y in pts])
            assert np.allclose(envs[:, 0], xs) and np.allclose(envs[:, 1], ys)
            # a multipoint of the same points must have the min/max box
            mp = struct.pack("<BII", 1, wkb.MULTIPOINT, len(pts)) + b"".join(vals)
            env = wkb.envelope(mp)
            assert env == (xs.min(), ys.min(), xs.max(), ys.max())

        check()

    def test_mixed_endianness_agrees(self):
        from hypothesis import given, settings
        from hypothesis import strategies as st

        finite = st.floats(allow_nan=False, allow_infinity=False,
                           width=64, min_value=-1e6, max_value=1e6)

        @settings(max_examples=100, deadline=None)
        @given(finite, finite)
        def check(x, y):
            le = struct.pack("<BIdd", 1, wkb.POINT, x, y)
            be = struct.pack(">BIdd", 0, wkb.POINT, x, y)
            assert wkb.envelope(le) == wkb.envelope(be)
            assert wkb.parse_point(le) == wkb.parse_point(be)

        check()


class TestGeoWithVariantMetrics:
    def test_variant_plus_geo_table_keeps_geo_bounds(self, spark, tmp_loc):
        """A variant column forces the JVM metrics plane (pyarrow can't
        open those footers); the geo envelope pass must still fill WKB
        bound points so st_intersects pruning works."""
        import iceberg_cpp_spark.core.manifests as mf

        sch = it.Schema([
            it.NestedField(1, "id", it.LongType(), True),
            it.NestedField(2, "payload", it.VariantType(), False),
            it.NestedField(3, "geom", it.GeometryType(), False),
        ])
        t = IceTable.create(spark, f"{tmp_loc}/t", sch,
                            properties={"format-version": "3"})
        rows = [(i, '{"k": %d}' % i, _pt(float(i * 10), 1.0))
                for i in range(4)]
        df = (spark.createDataFrame(rows, "id long, pj string, geom binary")
              .select("id", F.expr("parse_json(pj)").alias("payload"),
                      "geom").coalesce(1))
        t = t.append(df)
        snap = t.current_snapshot()
        e = [e for m in mf.read_manifest_list(snap.manifest_list)
             for e in mf.read_manifest(m.manifest_path, t.spec(),
                                       t.schema(), manifest=m)][0]
        assert wkb.parse_point(e.data_file.lower_bounds[3]) == (0.0, 1.0)
        assert wkb.parse_point(e.data_file.upper_bounds[3]) == (30.0, 1.0)
        assert t.scan(filter=ex.st_intersects(
            ex.Reference("geom"), (100.0, 0.0, 200.0, 2.0))).plan_files() == []
        got = t.scan(filter=ex.st_intersects(
            ex.Reference("geom"), (5.0, 0.0, 25.0, 2.0))).to_df()
        assert sorted(r["id"] for r in got.collect()) == [1, 2]


class TestGeohash:
    """functions/geohash.py — standard base32 geohash as pure JVM
    Column arithmetic, pinned against public vectors and a textbook
    bisection reference."""

    def test_public_vectors(self):
        from iceberg_cpp_spark.functions.geohash import geohash_py

        assert geohash_py(-5.60302734375, 42.60498046875, 5) == "ezs42"
        assert geohash_py(139.76608, 35.68123, 6) == "xn76ur"  # Tokyo
        assert geohash_py(0.0, 0.0, 1) == "s"

    def test_matches_textbook_bisection(self):
        import random

        from iceberg_cpp_spark.functions.geohash import ALPHABET, geohash_py

        def textbook(lat, lon, precision):
            lat_i, lon_i = (-90.0, 90.0), (-180.0, 180.0)
            bits, even = [], True
            while len(bits) < precision * 5:
                if even:
                    mid = (lon_i[0] + lon_i[1]) / 2
                    if lon >= mid:
                        bits.append(1); lon_i = (mid, lon_i[1])
                    else:
                        bits.append(0); lon_i = (lon_i[0], mid)
                else:
                    mid = (lat_i[0] + lat_i[1]) / 2
                    if lat >= mid:
                        bits.append(1); lat_i = (mid, lat_i[1])
                    else:
                        bits.append(0); lat_i = (lat_i[0], mid)
                even = not even
            return "".join(
                ALPHABET[int("".join(map(str, bits[k * 5:k * 5 + 5])), 2)]
                for k in range(precision))

        rng = random.Random(7)
        for _ in range(300):
            lon = rng.uniform(-180, 179.99)
            lat = rng.uniform(-90, 89.99)
            p = rng.randint(1, 9)
            assert geohash_py(lon, lat, p) == textbook(lat, lon, p)

    def test_spark_column_matches_python(self, spark):
        from iceberg_cpp_spark.functions.geohash import (geohash_column,
                                                         geohash_py)

        rows = [(i, -180.0 + (i * 37 % 3600) / 10.0,
                 -90.0 + (i * 13 % 1800) / 10.0) for i in range(200)]
        df = spark.createDataFrame(rows, "i long, lon double, lat double")
        got = {r["i"]: r["gh"] for r in df.select(
            "i", geohash_column(F.col("lon"), F.col("lat"), 6).alias("gh")
        ).collect()}
        for i, lon, lat in rows:
            assert got[i] == geohash_py(lon, lat, 6), (i, lon, lat)
        # nulls propagate
        n = spark.createDataFrame([(None, 1.0)], "lon double, lat double")
        assert n.select(geohash_column(F.col("lon"), F.col("lat"), 4)
                        .alias("g")).collect()[0]["g"] is None

    def test_bbox_and_covers(self):
        from iceberg_cpp_spark.functions.geohash import (geohash_bbox,
                                                         geohash_covers,
                                                         geohash_py)

        lo_x, lo_y, hi_x, hi_y = geohash_bbox("ezs42")
        assert lo_x <= -5.60302734375 <= hi_x
        assert lo_y <= 42.60498046875 <= hi_y
        covers = geohash_covers((-6.0, 42.0, -5.0, 43.0), 3)
        # every point of the box must hash into a covered prefix
        import random

        rng = random.Random(1)
        cs = set(covers)
        for _ in range(100):
            lon = rng.uniform(-6.0, -5.0)
            lat = rng.uniform(42.0, 43.0)
            assert geohash_py(lon, lat, 3) in cs
        with pytest.raises(ValueError, match="cells"):
            geohash_covers((-180, -90, 180, 90), 8, max_cells=10)

    def test_partition_pruning_via_geohash(self, spark, tmp_loc):
        from iceberg_cpp_spark.core.metadata import (PartitionField,
                                                     PartitionSpec)
        from iceberg_cpp_spark.functions import transforms as tr
        from iceberg_cpp_spark.functions.geohash import (geohash_column,
                                                         geohash_covers)

        sch = it.Schema([
            it.NestedField(1, "id", it.LongType(), True),
            it.NestedField(2, "gh", it.StringType(), False),
            it.NestedField(3, "geom", it.GeometryType(), False),
        ])
        spec = PartitionSpec(
            [PartitionField(2, 1000, "ghp", tr.truncate(2))], spec_id=0)
        t = IceTable.create(spark, f"{tmp_loc}/t", sch, spec=spec,
                            properties={"format-version": "3"})
        rows = spark.createDataFrame(
            [(i, -180.0 + i * 36.0, 10.0) for i in range(10)],
            "id long, lon double, lat double")
        df = rows.select(
            "id", geohash_column(F.col("lon"), F.col("lat"), 6).alias("gh"),
            _geo_pts(F.col("lon"), F.col("lat")).alias("geom"))
        t = t.append(df)
        box = (-10.0, 0.0, 50.0, 20.0)
        covers = geohash_covers(box, 2)
        pruned = t.scan(filter=ex.in_(ex.truncate(ex.Reference("gh"), 2),
                                      covers)).plan_files()
        assert 0 < len(pruned) < len(t.scan().plan_files())
        got = (t.scan(filter=ex.in_(ex.truncate(ex.Reference("gh"), 2),
                                    covers)
                      & ex.st_intersects(ex.Reference("geom"), box))
               .to_df().select("id").collect())
        assert sorted(r["id"] for r in got) == [5, 6]  # lon 0 and 36


class TestPipJoin:
    """pip_join (r12): exact point-in-polygon join — envelope
    candidates verified by the boundary-inclusive kernel."""

    def _mk(self, spark):
        from iceberg_cpp_spark.core import geom, wkb

        # two triangles: hypotenuses exclude the upper-right halves
        tris = spark.createDataFrame(
            [("t1", geom.polygon_wkb([(0, 0), (10, 0), (0, 10)])),
             ("t2", geom.polygon_wkb([(100, 0), (110, 0), (100, 10)]))],
            "name string, geom binary")
        pts = spark.createDataFrame(
            [(1, wkb.point_wkb(2.0, 2.0)),     # inside t1
             (2, wkb.point_wkb(8.0, 8.0)),     # in t1's bbox, outside
             (3, wkb.point_wkb(5.0, 5.0)),     # on t1's hypotenuse
             (4, wkb.point_wkb(101.0, 1.0)),   # inside t2
             (5, wkb.point_wkb(109.0, 9.0)),   # in t2's bbox, outside
             (6, wkb.point_wkb(50.0, 50.0))],  # nowhere
            "pid long, geom binary")
        return pts, tris

    def test_exact_pairs_only(self, spark):
        from iceberg_cpp_spark.operators import spatial

        pts, tris = self._mk(spark)
        got = {(r["pid"], r["name"]) for r in
               spatial.pip_join(pts, tris, cell=10.0).collect()}
        assert got == {(1, "t1"), (3, "t1"), (4, "t2")}
        # the envelope join alone would also pair 2 and 5
        env = {(r["pid"], r["name"]) for r in
               spatial.bbox_join(pts, tris, cell=10.0).collect()}
        assert {(2, "t1"), (5, "t2")} <= env

    def test_polygon_left_side(self, spark):
        """Left side need not be points — any WKB the kernel walks."""
        from iceberg_cpp_spark.core import geom
        from iceberg_cpp_spark.operators import spatial

        polys = spark.createDataFrame(
            [(1, geom.polygon_wkb([(1, 1), (3, 1), (3, 3), (1, 3)])),
             (2, geom.polygon_wkb([(8, 8), (9, 8), (9, 9), (8, 9)]))],
            "pid long, geom binary")
        tris = spark.createDataFrame(
            [("t1", geom.polygon_wkb([(0, 0), (10, 0), (0, 10)]))],
            "name string, geom binary")
        got = {(r["pid"], r["name"]) for r in
               spatial.pip_join(polys, tris, cell=10.0).collect()}
        assert got == {(1, "t1")}  # square 2 sits past the hypotenuse

    def test_grouped_kernel_mixed_batch(self, spark):
        """The r13 exact pass groups each Arrow batch by region bytes
        and runs the vectorized kernel per group: one batch mixing
        point and polygon lefts across TWO regions plus null rows must
        produce exactly the per-row answers."""
        from iceberg_cpp_spark.core import geom, wkb
        from iceberg_cpp_spark.operators import spatial
        from pyspark.sql import functions as F

        t1 = geom.polygon_wkb([(0, 0), (10, 0), (0, 10)])
        t2 = geom.polygon_wkb([(100, 0), (110, 0), (100, 10)])
        sq_in = geom.polygon_wkb([(1, 1), (3, 1), (3, 3), (1, 3)])
        sq_out = geom.polygon_wkb([(8, 8), (9, 8), (9, 9), (8, 9)])
        rows = [
            (1, wkb.point_wkb(2.0, 2.0), t1, True),
            (2, wkb.point_wkb(8.0, 8.0), t1, False),
            (3, sq_in, t1, True),
            (4, sq_out, t1, False),
            (5, wkb.point_wkb(101.0, 1.0), t2, True),
            (6, wkb.point_wkb(109.0, 9.0), t2, False),
            (7, None, t1, None),
            (8, wkb.point_wkb(2.0, 2.0), None, None),
        ]
        df = spark.createDataFrame(
            [(i, l, r) for i, l, r, _ in rows],
            "pid long, l binary, r binary")
        got = {r["pid"]: r["hit"] for r in df.withColumn(
            "hit", spatial._exact_pair_udf()(F.col("l"), F.col("r"))
        ).collect()}
        assert got == {i: want for i, _, _, want in rows}

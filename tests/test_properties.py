"""Property-based tests (hypothesis) for the pure kernels: single-value
serde, transforms, murmur3 vectorization parity, expression folding.
These complement the fixed golden vectors in test_transforms/test_core
with randomized coverage of the full input domains."""

import datetime as dt
from decimal import Decimal
from uuid import UUID

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from iceberg_cpp_spark.core import types as it
from iceberg_cpp_spark.core.literals import from_bytes, to_bytes
from iceberg_cpp_spark.functions import murmur3
from iceberg_cpp_spark.functions import transforms as tr
from iceberg_cpp_spark.plans import expressions as ex

I32 = st.integers(min_value=-(2**31), max_value=2**31 - 1)
I64 = st.integers(min_value=-(2**63), max_value=2**63 - 1)


class TestLiteralSerde:
    @given(I32)
    @settings(max_examples=60)
    def test_int_roundtrip(self, v):
        assert from_bytes(to_bytes(v, it.IntegerType()), it.IntegerType()) == v

    @given(I64)
    @settings(max_examples=60)
    def test_long_roundtrip(self, v):
        assert from_bytes(to_bytes(v, it.LongType()), it.LongType()) == v

    @given(st.text(max_size=80))
    @settings(max_examples=60)
    def test_string_roundtrip(self, s):
        assert from_bytes(to_bytes(s, it.StringType()), it.StringType()) == s

    @given(st.binary(max_size=64))
    @settings(max_examples=60)
    def test_binary_roundtrip(self, b):
        assert from_bytes(to_bytes(b, it.BinaryType()), it.BinaryType()) == b

    @given(st.floats(allow_nan=False, allow_infinity=False, width=64))
    @settings(max_examples=60)
    def test_double_roundtrip(self, f):
        assert from_bytes(to_bytes(f, it.DoubleType()), it.DoubleType()) == f

    @given(st.integers(min_value=-(10**15), max_value=10**15))
    @settings(max_examples=60)
    def test_decimal_roundtrip(self, unscaled):
        t = it.DecimalType(18, 3)
        v = Decimal(unscaled).scaleb(-3)
        assert from_bytes(to_bytes(v, t), t) == v

    @given(st.uuids())
    @settings(max_examples=30)
    def test_uuid_roundtrip(self, u):
        got = from_bytes(to_bytes(u, it.UuidType()), it.UuidType())
        assert got == UUID(str(u))

    @given(st.dates(min_value=dt.date(1, 1, 1), max_value=dt.date(9999, 1, 1)))
    @settings(max_examples=60)
    def test_date_roundtrip(self, d):
        days = (d - dt.date(1970, 1, 1)).days
        assert from_bytes(to_bytes(d, it.DateType()), it.DateType()) == days


class TestTransformProperties:
    @given(I64, st.integers(min_value=1, max_value=10**6))
    @settings(max_examples=80)
    def test_truncate_long_floor(self, v, w):
        t = tr.TruncateTransform(w)
        r = t.pyvalue(v, it.LongType())
        assert r <= v < r + w
        assert r % w == 0 or (r % w) + w == w  # width-aligned (floor mod)
        # idempotent
        assert t.pyvalue(r, it.LongType()) == r

    @given(st.text(max_size=40), st.integers(min_value=1, max_value=20))
    @settings(max_examples=60)
    def test_truncate_string_codepoints(self, s, w):
        r = tr.TruncateTransform(w).pyvalue(s, it.StringType())
        assert len(r) <= w and s.startswith(r)

    @given(I64, st.integers(min_value=1, max_value=4096))
    @settings(max_examples=80)
    def test_bucket_range(self, v, n):
        b = tr.BucketTransform(n).pyvalue(v, it.LongType())
        assert 0 <= b < n

    @given(st.text(max_size=40), st.integers(min_value=1, max_value=512))
    @settings(max_examples=60)
    def test_bucket_string_range_and_determinism(self, s, n):
        t = tr.BucketTransform(n)
        b1 = t.pyvalue(s, it.StringType())
        b2 = t.pyvalue(s, it.StringType())
        assert b1 == b2 and 0 <= b1 < n

    @given(st.lists(I64, min_size=1, max_size=50))
    @settings(max_examples=40)
    def test_murmur3_vectorized_matches_scalar(self, vals):
        vec = murmur3.hash_longs_vectorized(np.array(vals, dtype=np.int64))
        for v, h in zip(vals, vec):
            assert murmur3.hash_long(v) == int(h)

    @given(st.integers(min_value=-100_000, max_value=100_000))
    @settings(max_examples=60)
    def test_day_month_year_consistent(self, days):
        d = dt.date(1970, 1, 1) + dt.timedelta(days=days)
        y = tr.YearTransform().pyvalue(d, it.DateType())
        m = tr.MonthTransform().pyvalue(d, it.DateType())
        dd = tr.DayTransform().pyvalue(d, it.DateType())
        assert y == d.year - 1970
        assert m == (d.year - 1970) * 12 + d.month - 1
        assert dd == days
        # month of the year boundary is consistent
        assert m // 12 == y

    @given(st.one_of(st.none(), I64))
    @settings(max_examples=20)
    def test_null_in_null_out(self, v):
        for t in (tr.BucketTransform(8), tr.TruncateTransform(10),
                  tr.IdentityTransform(), tr.VoidTransform()):
            r = t.pyvalue(v, it.LongType())
            if v is None or isinstance(t, tr.VoidTransform):
                assert r is None


SCHEMA = it.Schema([
    it.NestedField(1, "a", it.LongType(), required=True),
    it.NestedField(2, "s", it.StringType()),
])


class TestExpressionFolding:
    @given(I64)
    @settings(max_examples=40)
    def test_double_negation(self, v):
        p = ex.lt(ex.Reference("a"), v)
        b = (~(~p)).bind(SCHEMA)
        assert repr(b) == repr(p.bind(SCHEMA))

    @given(st.lists(I64, min_size=0, max_size=5))
    @settings(max_examples=40)
    def test_empty_and_single_in(self, vals):
        p = ex.in_(ex.Reference("a"), vals).bind(SCHEMA)
        if not vals:
            assert isinstance(p, ex.FalseExp)

    @given(I64)
    @settings(max_examples=40)
    def test_and_or_short_circuit(self, v):
        p = ex.lt(ex.Reference("a"), v)
        assert isinstance((p & ex.FalseExp()).bind(SCHEMA), ex.FalseExp)
        assert isinstance((p | ex.TrueExp()).bind(SCHEMA), ex.TrueExp)

    @given(st.integers(min_value=2**31, max_value=2**40))
    @settings(max_examples=30)
    def test_out_of_range_int_folds(self, v):
        schema = it.Schema([it.NestedField(1, "i", it.IntegerType())])
        assert isinstance(ex.gt(ex.Reference("i"), v).bind(schema), ex.FalseExp)
        assert isinstance(ex.lt(ex.Reference("i"), v).bind(schema), ex.TrueExp)


class TestRoaringProperties:
    """Portable-serde invariants for core/roaring.py (the DV encoding):
    any uint64 set round-trips; union == set union; membership == set
    membership. Mixed densities force array AND bitset containers."""

    @given(st.lists(st.integers(min_value=0, max_value=2**63 - 1),
                    min_size=0, max_size=300))
    @settings(max_examples=50, deadline=None)
    def test_roundtrip_any_set(self, vals):
        import numpy as np

        from iceberg_cpp_spark.core.roaring import Roaring64

        arr = np.array(vals, dtype=np.uint64)
        rb = Roaring64.from_array(arr)
        back = Roaring64.deserialize(rb.serialize())
        assert back == rb
        assert back.to_array().tolist() == sorted(set(vals))

    @given(st.lists(st.integers(min_value=0, max_value=2**20), min_size=0,
                    max_size=200),
           st.lists(st.integers(min_value=0, max_value=2**20), min_size=0,
                    max_size=200))
    @settings(max_examples=40, deadline=None)
    def test_union_and_membership(self, a, b):
        import numpy as np

        from iceberg_cpp_spark.core.roaring import Roaring64

        ra = Roaring64.from_array(np.array(a, dtype=np.uint64))
        rbm = Roaring64.from_array(np.array(b, dtype=np.uint64))
        u = ra.union(rbm)
        assert u.to_array().tolist() == sorted(set(a) | set(b))
        probe = np.array((a[:20] + b[:20] + [0, 1, 2**19]), dtype=np.uint64)
        got = u.contains_many(probe)
        want = [int(v) in (set(a) | set(b)) for v in probe]
        assert got.tolist() == want

    @given(st.integers(min_value=0, max_value=2**16 - 1),
           st.integers(min_value=1, max_value=2**16))
    @settings(max_examples=25, deadline=None)
    def test_dense_ranges_cross_container_boundary(self, start, n):
        import numpy as np

        from iceberg_cpp_spark.core.roaring import Roaring64

        vals = np.arange(start, start + n, dtype=np.uint64)
        rb = Roaring64.deserialize(
            Roaring64.from_array(vals).serialize())
        assert rb.cardinality == n
        assert rb.to_array()[0] == start and rb.to_array()[-1] == start + n - 1


class TestAvroDataProperties:
    """Random typed records through the pure-Python Avro data-file
    writer and the field-id-projected reader — the serde the add_files
    interop leg rests on."""

    SCHEMA = it.Schema([
        it.NestedField(1, "id", it.LongType(), True),
        it.NestedField(2, "name", it.StringType()),
        it.NestedField(3, "x", it.DoubleType()),
        it.NestedField(4, "flag", it.BooleanType()),
        it.NestedField(5, "tags", it.ListType(6, it.StringType())),
        it.NestedField(7, "m",
                       it.MapType(8, it.StringType(), 9, it.LongType())),
    ], schema_id=0)

    @given(st.lists(
        st.fixed_dictionaries({
            "id": I64,
            "name": st.one_of(st.none(), st.text(max_size=30)),
            "x": st.one_of(st.none(),
                           st.floats(allow_nan=False, allow_infinity=False,
                                     width=64)),
            "flag": st.one_of(st.none(), st.booleans()),
            "tags": st.one_of(st.none(),
                              st.lists(st.text(max_size=8), max_size=4)),
            "m": st.one_of(st.none(),
                           st.dictionaries(st.text(min_size=1, max_size=6),
                                           I64, max_size=3)),
        }), min_size=0, max_size=20))
    @settings(max_examples=40, deadline=None)
    def test_write_read_roundtrip(self, rows):
        import os
        import tempfile

        from iceberg_cpp_spark.core import avro as av

        with tempfile.TemporaryDirectory() as d:
            p = os.path.join(d, "r.avro")
            assert av.write_avro_data(p, self.SCHEMA, rows) == len(rows)
            back = av.data_records(av.read_avro(p), self.SCHEMA)
            assert back == rows
            assert av.avro_record_count(p) == len(rows)


class TestGifLzwProperties:
    """encode_gif's LZW compressor against the decoder on random index
    streams — dictionary growth, code-size bumps, and the 4096-table
    CLEAR/reset all land in-sync between the two sides."""

    @given(st.integers(min_value=2, max_value=8),
           st.data())
    @settings(max_examples=60, deadline=None)
    def test_lzw_roundtrip(self, min_code, data):
        from iceberg_cpp_spark.operators.codecs import (
            _lzw_decode, _lzw_encode)

        nsym = 1 << min_code
        idx = data.draw(st.lists(
            st.integers(min_value=0, max_value=nsym - 1),
            min_size=0, max_size=3000))
        out = _lzw_decode(min_code, _lzw_encode(min_code, idx),
                          max_out=len(idx) + 1)
        assert out == idx

    def test_lzw_table_reset_path(self):
        # long low-entropy stream forces the 4096-entry table reset
        from iceberg_cpp_spark.operators.codecs import (
            _lzw_decode, _lzw_encode)

        idx = ([0, 1] * 40000) + list(range(4)) * 5000
        out = _lzw_decode(2, _lzw_encode(2, idx), max_out=len(idx) + 1)
        assert out == idx


class TestBloomFilterProperties:
    """write.parquet.bloom-filter-* / write.orc.bloom.filter.* — the
    reference declares these with no writer behind them
    (table_properties.h:143-148, 165-167) and leaves reader bloom
    row-group filtering TODO (parquet_reader.cc:221). Here they map
    onto the Spark/parquet-mr and ORC writer options; verification
    reads the footers back through the JVM."""

    def test_parquet_bloom_written_for_declared_column(self, spark, tmp_loc):
        from pyspark.sql import functions as F

        from iceberg_cpp_spark import IceTable
        from iceberg_cpp_spark.core.types import schema_from_spark
        from iceberg_cpp_spark.plans import expressions as ex

        df = spark.range(0, 20000).select(
            F.col("id").alias("k"),
            F.concat(F.lit("u"), F.col("id")).alias("s"))
        t = IceTable.create(
            spark, f"{tmp_loc}/t", schema_from_spark(df.schema),
            properties={
                "write.parquet.bloom-filter-enabled.column.s": "true",
                "write.parquet.bloom-filter-fpp.column.s": "0.01",
                "write.parquet.bloom-filter-max-bytes": "131072"})
        t = t.append(df.coalesce(1))
        p = [f.file_path for f in t.scan().plan_files()][0]
        jvm = spark._jvm
        conf = spark._jsc.hadoopConfiguration()
        footer = jvm.org.apache.parquet.hadoop.ParquetFileReader.readFooter(
            conf, jvm.org.apache.hadoop.fs.Path(p))
        offs = {c.getPath().toDotString(): c.getBloomFilterOffset()
                for c in footer.getBlocks().get(0).getColumns()}
        assert offs["s"] > 0, "declared column must carry a bloom filter"
        assert offs["k"] == -1, "undeclared column must not"
        # point lookup stays correct through the scan path
        got = t.scan(filter=ex.eq(ex.Reference("s"), "u12345")).to_df()
        assert got.count() == 1

    def test_orc_bloom_option_applies(self, spark, tmp_loc):
        from pyspark.sql import functions as F

        from iceberg_cpp_spark import IceTable
        from iceberg_cpp_spark.core.types import schema_from_spark

        df = spark.range(0, 5000).select(
            F.col("id").alias("k"),
            F.concat(F.lit("u"), F.col("id")).alias("s"))
        t = IceTable.create(
            spark, f"{tmp_loc}/t", schema_from_spark(df.schema),
            properties={"write.format.default": "orc",
                        "write.orc.bloom.filter.columns": "s",
                        "write.orc.bloom.filter.fpp": "0.02"})
        t = t.append(df.coalesce(1))
        files = list(t.scan().plan_files())
        assert {x.file_format for x in files} == {"orc"}
        assert t.to_df().count() == 5000
        # a same-data table WITHOUT the bloom property writes smaller
        # files (the filter bytes are real)
        t2 = IceTable.create(
            spark, f"{tmp_loc}/t2", schema_from_spark(df.schema),
            properties={"write.format.default": "orc"})
        t2 = t2.append(df.coalesce(1))
        sz = sum(x.file_size_in_bytes for x in files)
        sz2 = sum(x.file_size_in_bytes for x in t2.scan().plan_files())
        assert sz > sz2

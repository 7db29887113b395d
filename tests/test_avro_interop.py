"""Avro WRITER interop proof (VERDICT r03 item 6): decode the engine's
spec-v2 manifest/manifest-list output with an INDEPENDENT minimal Avro
container decoder implemented here from the public Avro 1.12 spec
(stdlib only — the container has no fastavro/spark-avro in this env).
The mini-decoder shares no code with iceberg_cpp_spark.core.avro; it is
first validated against the reference repo's own snap-*.avro fixtures
(written by the Java Avro library), then used to pin our writer's byte
compatibility. Ref: manifest_reader_writer_test.cc:167-300."""

from __future__ import annotations

import glob
import json
import os
import struct
import zlib

import pytest

from iceberg_cpp_spark.core import avro as av
from iceberg_cpp_spark.core import manifests as mf
from iceberg_cpp_spark.core import types as it
from iceberg_cpp_spark.core.metadata import PartitionField, PartitionSpec
from iceberg_cpp_spark.functions import transforms as tr

REF_FIXTURES = sorted(glob.glob(
    "/root/reference/src/iceberg/test/resources/snap-*.avro"))


# ---------------------------------------------------------------------------
# Minimal independent Avro container decoder (Avro 1.12 spec §§ object
# container files + binary encoding). No imports from core/avro.py paths.
# ---------------------------------------------------------------------------

class _R:
    def __init__(self, buf: bytes):
        self.b = buf
        self.i = 0

    def read(self, n: int) -> bytes:
        out = self.b[self.i:self.i + n]
        if len(out) != n:
            raise EOFError
        self.i += n
        return out

    def zlong(self) -> int:
        shift = acc = 0
        while True:
            byte = self.b[self.i]
            self.i += 1
            acc |= (byte & 0x7F) << shift
            if not byte & 0x80:
                break
            shift += 7
        return (acc >> 1) ^ -(acc & 1)  # zigzag

    def zbytes(self) -> bytes:
        return self.read(self.zlong())

    def zstr(self) -> str:
        return self.zbytes().decode("utf-8")


def _decode(schema, r: _R, named: dict):
    if isinstance(schema, str):
        if schema in named:
            return _decode(named[schema], r, named)
        t = schema
    elif isinstance(schema, list):  # union: zlong branch index
        return _decode(schema[r.zlong()], r, named)
    else:
        t = schema["type"]
        if t in ("record", "fixed", "enum") and schema.get("name"):
            named[schema["name"]] = schema
    if t == "null":
        return None
    if t == "boolean":
        return r.read(1) == b"\x01"
    if t in ("int", "long"):
        return r.zlong()
    if t == "float":
        return struct.unpack("<f", r.read(4))[0]
    if t == "double":
        return struct.unpack("<d", r.read(8))[0]
    if t == "bytes":
        return r.zbytes()
    if t == "string":
        return r.zstr()
    if t == "fixed":
        return r.read(schema["size"])
    if t == "enum":
        return schema["symbols"][r.zlong()]
    if t == "record":
        return {f["name"]: _decode(f["type"], r, named)
                for f in schema["fields"]}
    if t == "array":
        out = []
        while True:
            n = r.zlong()
            if n == 0:
                return out
            if n < 0:
                n = -n
                r.zlong()  # block byte size, unused
            for _ in range(n):
                out.append(_decode(schema["items"], r, named))
    if t == "map":
        out = {}
        while True:
            n = r.zlong()
            if n == 0:
                return out
            if n < 0:
                n = -n
                r.zlong()
            for _ in range(n):
                k = r.zstr()  # key MUST read before value (RHS-first!)
                out[k] = _decode(schema["values"], r, named)
    raise NotImplementedError(t)


def mini_read_avro(path: str):
    """→ (metadata dict, records list) per the Avro container spec."""
    with open(path, "rb") as f:
        r = _R(f.read())
    assert r.read(4) == b"Obj\x01", "bad container magic"
    meta = {}
    while True:
        n = r.zlong()
        if n == 0:
            break
        if n < 0:
            n = -n
            r.zlong()
        for _ in range(n):
            k = r.zstr()  # key MUST read before value (RHS-first!)
            meta[k] = r.zbytes()
    sync = r.read(16)
    schema = json.loads(meta[b"avro.schema"].decode()
                        if b"avro.schema" in meta else meta["avro.schema"])
    codec = meta.get(b"avro.codec", meta.get("avro.codec", b"null"))
    records = []
    while r.i < len(r.b):
        count = r.zlong()
        size = r.zlong()
        block = r.read(size)
        if codec == b"deflate":
            block = zlib.decompress(block, -15)
        elif codec not in (b"null", None):
            raise NotImplementedError(codec)
        br = _R(block)
        named: dict = {}
        for _ in range(count):
            records.append(_decode(schema, br, named))
        assert r.read(16) == sync, "sync marker mismatch"
    return meta, records


# ---------------------------------------------------------------------------
# 1. The mini-decoder itself is sound: it reproduces the Java-written
#    reference fixtures that core/avro.py also decodes.
# ---------------------------------------------------------------------------

@pytest.mark.skipif(not REF_FIXTURES, reason="reference fixtures absent")
def test_mini_decoder_agrees_with_engine_on_reference_fixtures():
    for path in REF_FIXTURES:
        meta, recs = mini_read_avro(path)
        ours = av.read_avro(path).records
        assert len(recs) == len(ours)
        for a, b in zip(recs, ours):
            assert a["manifest_path"] == b["manifest_path"]
            assert a["manifest_length"] == b["manifest_length"]
            assert a["partition_spec_id"] == b["partition_spec_id"]


# ---------------------------------------------------------------------------
# 2. Writer interop: our spec-v2 manifest bytes decode identically under
#    the independent decoder.
# ---------------------------------------------------------------------------

def _schema():
    return it.Schema([
        it.NestedField(1, "id", it.LongType(), required=True),
        it.NestedField(2, "d", it.DateType()),
    ], schema_id=0)


def _datafile(i, part=None):
    return mf.DataFile(
        content=mf.CONTENT_DATA, file_path=f"/data/f{i}.parquet",
        file_format="parquet", partition=part or {}, record_count=10 * i,
        file_size_in_bytes=1000 + i, value_counts={1: 10},
        lower_bounds={1: (1).to_bytes(8, "little")},
        upper_bounds={1: (9).to_bytes(8, "little")})


def test_written_manifest_decodes_independently(tmp_path):
    spec = PartitionSpec([PartitionField(2, 1000, "d_day", tr.DayTransform())])
    path = os.path.join(tmp_path, "m.avro")
    w = mf.ManifestWriter(path, spec, _schema(), snapshot_id=7, format="avro")
    w.add_file(_datafile(1, part={"d_day": 19000}), sequence_number=3)
    w.add_file(_datafile(2, part={"d_day": None}), sequence_number=3)
    w.close()

    meta, recs = mini_read_avro(path)
    key = {k.decode() if isinstance(k, bytes) else k: v for k, v in meta.items()}
    assert key["format-version"] == b"2"
    assert key["content"] == b"data"
    assert json.loads(key["partition-spec"])  # valid spec JSON
    assert len(recs) == 2
    e1, e2 = recs
    assert e1["status"] == 1  # ADDED
    assert e1["snapshot_id"] == 7
    df1 = e1["data_file"]
    assert df1["file_path"] == "/data/f1.parquet"
    assert df1["record_count"] == 10
    assert df1["partition"]["d_day"] == 19000
    assert e2["data_file"]["partition"]["d_day"] is None
    # column stats maps survive as key/value record arrays or maps
    vc = df1["value_counts"]
    pairs = vc if isinstance(vc, dict) else {x["key"]: x["value"] for x in vc}
    assert pairs == {1: 10}
    lb = df1["lower_bounds"]
    lbp = lb if isinstance(lb, dict) else {x["key"]: x["value"] for x in lb}
    assert lbp[1] == (1).to_bytes(8, "little")


def test_written_manifest_list_decodes_independently(tmp_path):
    path = os.path.join(tmp_path, "snap.avro")
    m = mf.ManifestFile(
        manifest_path="/meta/m1.avro", manifest_length=123,
        partition_spec_id=0, sequence_number=2, min_sequence_number=1,
        added_snapshot_id=42, added_files_count=1, added_rows_count=10,
        partitions=[mf.PartitionFieldSummary(
            contains_null=False, contains_nan=False,
            lower_bound=b"\x01", upper_bound=b"\x09")])
    lw = mf.ManifestListWriter(path, snapshot_id=42, sequence_number=2,
                               format="avro", parent_snapshot_id=41)
    lw.add(m)
    lw.close()

    meta, recs = mini_read_avro(path)
    assert len(recs) == 1
    r = recs[0]
    assert r["manifest_path"] == "/meta/m1.avro"
    assert r["manifest_length"] == 123
    assert r["added_snapshot_id"] == 42
    assert r["added_rows_count"] == 10
    ps = r["partitions"]
    assert ps and ps[0]["contains_null"] is False
    assert ps[0]["upper_bound"] == b"\x09"


def test_written_container_structure_matches_reference_layout(tmp_path):
    """Byte-level container invariants shared with the Java-written
    fixtures: magic, schema metadata, 16-byte sync discipline."""
    path = os.path.join(tmp_path, "m2.avro")
    w = mf.ManifestWriter(path, PartitionSpec.unpartitioned(), _schema(),
                          snapshot_id=1, format="avro")
    w.add_file(_datafile(1), sequence_number=1)
    w.close()
    raw = open(path, "rb").read()
    assert raw[:4] == b"Obj\x01"
    if REF_FIXTURES:
        ref = open(REF_FIXTURES[0], "rb").read()
        assert ref[:4] == raw[:4]
    meta, recs = mini_read_avro(path)
    schema = json.loads((meta.get(b"avro.schema") or meta["avro.schema"]).decode()
                        if isinstance(meta.get(b"avro.schema"), bytes)
                        else meta["avro.schema"])
    assert schema["type"] == "record"
    names = {f["name"] for f in schema["fields"]}
    assert {"status", "snapshot_id", "data_file"} <= names

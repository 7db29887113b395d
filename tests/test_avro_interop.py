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


def test_v3_writer_unassigned_span_advances_next_row_id(tmp_path):
    """ADVICE r09: when the v3 list writer assigns first_row_id spans to
    writer-unassigned data manifests (foreign manifests relying on
    manifest-level inheritance), it must report the consumed span so the
    engine advances next-row-id — otherwise a later append re-issues
    overlapping row ids."""
    path = os.path.join(tmp_path, "snapv3.avro")
    own = mf.ManifestFile(
        manifest_path="/meta/own.avro", manifest_length=1,
        partition_spec_id=0, sequence_number=2, min_sequence_number=1,
        added_snapshot_id=42, added_files_count=1, added_rows_count=10,
        first_row_id=100)  # explicitly assigned: no span consumed
    foreign = mf.ManifestFile(
        manifest_path="/meta/foreign.avro", manifest_length=1,
        partition_spec_id=0, sequence_number=2, min_sequence_number=1,
        added_snapshot_id=42, added_files_count=2, added_rows_count=7,
        existing_files_count=1, existing_rows_count=3,
        first_row_id=None)  # writer-unassigned
    deletes = mf.ManifestFile(
        manifest_path="/meta/del.avro", manifest_length=1,
        partition_spec_id=0, content=mf.MANIFEST_CONTENT_DELETES,
        sequence_number=2, min_sequence_number=2,
        added_snapshot_id=42, added_files_count=1, added_rows_count=4)
    lw = mf.ManifestListWriter(path, snapshot_id=42, sequence_number=2,
                               format="avro", parent_snapshot_id=41,
                               version=3, next_row_id=110)
    for m in (own, foreign, deletes):
        lw.add(m)
    lw.close()
    # the foreign data manifest consumed [110, 120): 7 added + 3 existing
    assert lw.assigned_next_row_id == 120
    _meta, recs = mini_read_avro(path)
    by_path = {r["manifest_path"]: r for r in recs}
    assert by_path["/meta/own.avro"]["first_row_id"] == 100
    assert by_path["/meta/foreign.avro"]["first_row_id"] == 110
    assert by_path["/meta/del.avro"]["first_row_id"] is None


# ---------------------------------------------------------------------------
# 3. V1 writing (VERDICT r06 task 5; reference manifest_writer.h:63,123
#    MakeV1Writer + v1_metadata.cc adapters): v1-pinned consumers resolve
#    Avro by NAME, so the v1 layout must carry the v1 field names, the
#    required block_size_in_bytes, and no v2/v3 fields.
# ---------------------------------------------------------------------------

def _schema_of(meta) -> dict:
    raw = meta.get(b"avro.schema") or meta["avro.schema"]
    return json.loads(raw.decode() if isinstance(raw, bytes) else raw)


def test_v1_manifest_writes_spec_layout(tmp_path):
    spec = PartitionSpec([PartitionField(2, 1000, "d_day", tr.DayTransform())])
    path = os.path.join(tmp_path, "m_v1.avro")
    w = mf.ManifestWriter(path, spec, _schema(), snapshot_id=7,
                          format="avro", version=1)
    w.add_file(_datafile(1, part={"d_day": 19000}), sequence_number=3)
    w.close()

    meta, recs = mini_read_avro(path)
    key = {k.decode() if isinstance(k, bytes) else k: v for k, v in meta.items()}
    assert key["format-version"] == b"1"
    assert "content" not in key  # v2-only metadata key
    schema = _schema_of(meta)
    enames = [f["name"] for f in schema["fields"]]
    assert enames == ["status", "snapshot_id", "data_file"]
    # snapshot_id REQUIRED in v1 (plain long, not a union)
    snap_f = next(f for f in schema["fields"] if f["name"] == "snapshot_id")
    assert snap_f["type"] == "long"
    dnames = [f["name"] for f in
              next(f for f in schema["fields"]
                   if f["name"] == "data_file")["type"]["fields"]]
    assert "block_size_in_bytes" in dnames
    assert "content" not in dnames and "equality_ids" not in dnames
    assert "first_row_id" not in dnames  # v3 field never in v1
    e = recs[0]
    assert e["snapshot_id"] == 7
    assert e["data_file"]["block_size_in_bytes"] == 64 * 1024 * 1024
    assert e["data_file"]["partition"]["d_day"] == 19000

    # our field-id reader decodes the v1 file back losslessly
    entries = av.manifest_entries_from_avro(path)
    assert entries[0].data_file.file_path == "/data/f1.parquet"
    assert entries[0].data_file.record_count == 10
    assert entries[0].snapshot_id == 7


def test_v1_manifest_list_writes_spec_layout(tmp_path):
    path = os.path.join(tmp_path, "snap_v1.avro")
    m = mf.ManifestFile(
        manifest_path="/meta/m1.avro", manifest_length=123,
        partition_spec_id=0, sequence_number=0, min_sequence_number=0,
        added_snapshot_id=42, added_files_count=1, added_rows_count=10,
        partitions=[mf.PartitionFieldSummary(
            contains_null=False, contains_nan=None,
            lower_bound=b"\x01", upper_bound=b"\x09")])
    lw = mf.ManifestListWriter(path, snapshot_id=42, sequence_number=0,
                               format="avro", version=1)
    lw.add(m)
    lw.close()

    meta, recs = mini_read_avro(path)
    key = {k.decode() if isinstance(k, bytes) else k: v for k, v in meta.items()}
    assert key["format-version"] == b"1"
    assert "sequence-number" not in key  # v2-only
    assert key["parent-snapshot-id"] == b"null"  # v1 writes it always
    names = [f["name"] for f in _schema_of(meta)["fields"]]
    # the v1 field NAMES (Avro resolution is name-based)
    assert "added_data_files_count" in names
    assert "content" not in names and "sequence_number" not in names
    r = recs[0]
    assert r["added_data_files_count"] == 1
    assert r["added_snapshot_id"] == 42

    # field-id reader round-trip: counts land on the v2-named attrs
    back = mf.read_manifest_list(path)[0]
    assert back.manifest_path == "/meta/m1.avro"
    assert back.added_files_count == 1
    assert back.added_rows_count == 10
    assert back.content == mf.MANIFEST_CONTENT_DATA
    assert back.partitions[0].upper_bound == b"\x09"


def test_v1_rejects_delete_manifests(tmp_path):
    with pytest.raises(ValueError, match="v1"):
        mf.ManifestWriter(os.path.join(tmp_path, "x.avro"),
                          PartitionSpec.unpartitioned(), _schema(),
                          snapshot_id=1, content=mf.MANIFEST_CONTENT_DELETES,
                          format="avro", version=1)
    lw = mf.ManifestListWriter(os.path.join(tmp_path, "s.avro"),
                               snapshot_id=1, sequence_number=0,
                               format="avro", version=1)
    dm = mf.ManifestFile(manifest_path="/m.avro", manifest_length=1,
                         partition_spec_id=0,
                         content=mf.MANIFEST_CONTENT_DELETES,
                         sequence_number=0, min_sequence_number=0,
                         added_snapshot_id=1)
    with pytest.raises(ValueError, match="v1"):
        lw.add(dm)


# ---------------------------------------------------------------------------
# 4. Manifest-list round-trip against EVERY Java-written reference fixture
#    (VERDICT r06 task 4, offline fallback: no pyiceberg/duckdb-iceberg in
#    this env): fixture → our reader → our v2-Avro writer → our reader AND
#    the independent mini-decoder → every ManifestFile field identical.
# ---------------------------------------------------------------------------

@pytest.mark.skipif(not REF_FIXTURES, reason="reference fixtures absent")
def test_manifest_list_roundtrip_reference_fixtures(tmp_path):
    import dataclasses

    for i, path in enumerate(REF_FIXTURES):
        orig = av.manifest_list_from_avro(path)
        assert orig, f"fixture decoded empty: {path}"
        fmeta = av.read_avro(path).metadata
        snap_id = int(fmeta.get(b"snapshot-id", b"1"))
        seq = int(fmeta.get(b"sequence-number", b"0") or 0)
        out = os.path.join(tmp_path, f"rt_{i}.avro")
        lw = mf.ManifestListWriter(out, snapshot_id=snap_id,
                                   sequence_number=seq, format="avro")
        for m in orig:
            lw.add(m)
        lw.close()
        back = mf.read_manifest_list(out)
        assert len(back) == len(orig)
        for a, b in zip(orig, back):
            assert dataclasses.asdict(a) == dataclasses.asdict(b), path
        # and the independent decoder agrees on the identity fields
        _, recs = mini_read_avro(out)
        for a, r in zip(orig, recs):
            assert r["manifest_path"] == a.manifest_path
            assert r["manifest_length"] == a.manifest_length
            assert r["added_snapshot_id"] == a.added_snapshot_id


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

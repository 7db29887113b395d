"""Multimodal column plumbing: image/audio/video as opaque binary
columns with typed metadata.

The Spark-side machinery — schemas, Arrow-batched UDF signatures,
partition-friendly batch shapes — is real and tested. The actual codec
step is STUBBED (no image/audio libraries in this environment): decoders
raise NotImplementedError unless ``fake=True``, which substitutes a
deterministic header-parse so the pipeline shape can be exercised
end-to-end.
"""

from __future__ import annotations

import hashlib
import struct
from typing import Iterable, Iterator

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

MEDIA_SCHEMA = (
    "media_id long, kind string, payload binary, mime string, "
    "width int, height int, duration_ms long, sample_rate int"
)


def with_media_metadata(df: DataFrame, payload_col: str = "payload") -> DataFrame:
    """Cheap JVM-side metadata: size + sha256 content address + magic-byte
    sniff. No decode, no python."""
    p = F.col(payload_col)
    magic = F.hex(F.substring(p, 1, 4))
    return df.withColumns({
        "byte_size": F.length(p).cast("long"),
        "content_sha256": F.sha2(p, 256),
        "sniffed_mime": (
            F.when(magic.startswith("FFD8"), F.lit("image/jpeg"))
            .when(magic == F.lit("89504E47"), F.lit("image/png"))
            .when(magic == F.lit("52494646"), F.lit("audio/wav"))
            .otherwise(F.lit("application/octet-stream"))
        ),
    })


def _fake_decode(payload: bytes) -> dict:
    """Deterministic stand-in for a real decoder: 'dimensions' from a
    stable digest, 'features' from byte histogram moments."""
    d = hashlib.sha256(payload or b"").digest()
    w = 64 + struct.unpack("<H", d[0:2])[0] % 1984
    h = 64 + struct.unpack("<H", d[2:4])[0] % 1984
    arr = np.frombuffer(payload or b"\x00", dtype=np.uint8)
    hist = np.bincount(arr, minlength=256).astype(np.float64)
    hist /= max(hist.sum(), 1.0)
    feats = [float(arr.mean()), float(arr.std()),
             float(-np.sum(hist[hist > 0] * np.log2(hist[hist > 0])))]
    return {"width": w, "height": h, "features": feats}


def decode_images(df: DataFrame, payload_col: str = "payload",
                  id_col: str = "media_id", fake: bool = False) -> DataFrame:
    """Arrow-batched decode → (id, width, height, features array<double>).
    Real decode requires an image library not present in this container —
    STUB: raises NotImplementedError unless fake=True."""

    def run(batches: Iterable[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for b in batches:
            if not fake:
                raise NotImplementedError(
                    "image decode requires PIL/opencv (not in this environment); "
                    "pass fake=True to exercise the pipeline with a deterministic stub")
            rows = [_fake_decode(bytes(p) if p is not None else b"")
                    for p in b[payload_col]]
            yield pd.DataFrame({
                id_col: b[id_col],
                "width": [r["width"] for r in rows],
                "height": [r["height"] for r in rows],
                "features": [r["features"] for r in rows],
            })

    out_schema = f"{id_col} long, width int, height int, features array<double>"
    return df.select(id_col, payload_col).mapInPandas(run, schema=out_schema)


def sample_frames(df: DataFrame, payload_col: str = "payload",
                  id_col: str = "media_id", every_ms: int = 1000,
                  fake: bool = False) -> DataFrame:
    """Frame-sampling plumbing for video payloads: one output row per
    sampled frame (id, frame_idx, ts_ms, frame_sha). STUB decode."""

    def run(batches: Iterable[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for b in batches:
            if not fake:
                raise NotImplementedError(
                    "video decode requires ffmpeg bindings (not in this environment); "
                    "pass fake=True for the deterministic stub")
            ids, idxs, tss, shas = [], [], [], []
            for mid, p in zip(b[id_col], b[payload_col]):
                payload = bytes(p) if p is not None else b""
                n = 1 + len(payload) % 5  # deterministic fake frame count
                for i in range(n):
                    ids.append(mid)
                    idxs.append(i)
                    tss.append(i * every_ms)
                    shas.append(hashlib.sha256(payload + i.to_bytes(4, "little")).hexdigest())
            yield pd.DataFrame({id_col: pd.Series(ids, dtype="int64"),
                                "frame_idx": pd.Series(idxs, dtype="int32"),
                                "ts_ms": pd.Series(tss, dtype="int64"),
                                "frame_sha": shas})

    out_schema = f"{id_col} long, frame_idx int, ts_ms long, frame_sha string"
    return df.select(id_col, payload_col).mapInPandas(run, schema=out_schema)


def resize_images(df: DataFrame, width: int, height: int,
                  payload_col: str = "payload", id_col: str = "media_id",
                  fake: bool = False) -> DataFrame:
    """Resize plumbing (id, payload) → (id, resized binary). STUB codec:
    with fake=True returns a deterministic digest-sized payload."""

    def run(batches: Iterable[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for b in batches:
            if not fake:
                raise NotImplementedError(
                    "image resize requires PIL/opencv; pass fake=True for the stub")
            out = [hashlib.sha256((bytes(p) if p is not None else b"")
                                  + struct.pack("<II", width, height)).digest()
                   for p in b[payload_col]]
            yield pd.DataFrame({id_col: b[id_col], "resized": out})

    return df.select(id_col, payload_col).mapInPandas(
        run, schema=f"{id_col} long, resized binary")

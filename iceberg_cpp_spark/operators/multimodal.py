"""Multimodal column plumbing: image/audio/video as opaque binary
columns with typed metadata.

The Spark-side machinery — schemas, Arrow-batched UDF signatures,
partition-friendly batch shapes — is real and tested. Codec status:

- PNG (incl. palette/interlaced/16-bit), GIF (first frame, LZW), and
  WAV decode are REAL (stdlib zlib/wave + own LZW in
  ``operators/codecs.py`` — no PIL/ffmpeg needed).
- JPEG decode/encode/resize is REAL (baseline sequential AND progressive
  DCT implemented from ITU-T T.81 in ``operators/jpeg.py`` — numpy only;
  arithmetic-coded/hierarchical/lossless JPEG raises).
- Video remains a STUB: the frame sampler raises NotImplementedError
  unless ``fake=True``, which substitutes a deterministic header-parse
  so the pipeline shape can still be exercised end-to-end.
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
            .when(magic == F.lit("47494638"), F.lit("image/gif"))
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


def _real_decode(payload: bytes) -> dict:
    """Real image decode: PNG (stdlib codec), baseline/progressive JPEG
    (operators/jpeg.py, numpy-only T.81 implementation), and first-frame
    GIF (own LZW). Other formats raise."""
    from iceberg_cpp_spark.operators import codecs

    if codecs.is_png(payload):
        d = codecs.decode_png(payload)
    elif codecs.is_jpeg(payload):
        d = codecs.decode_jpeg(payload)
    elif codecs.is_gif(payload):
        d = codecs.decode_gif(payload)
    else:
        raise NotImplementedError(
            "real decode supports PNG, JPEG, and GIF; pass fake=True "
            "for the deterministic stub on other formats")
    px = d["pixels"].astype(np.float64)
    hist = np.bincount(d["pixels"].reshape(-1), minlength=256).astype(np.float64)
    hist /= max(hist.sum(), 1.0)
    nz = hist[hist > 0]
    return {"width": d["width"], "height": d["height"],
            "features": [float(px.mean()), float(px.std()),
                         float(-np.sum(nz * np.log2(nz)))]}


def decode_images(df: DataFrame, payload_col: str = "payload",
                  id_col: str = "media_id", fake: bool = False,
                  on_error: str = "raise") -> DataFrame:
    """Arrow-batched decode → (id, width, height, features array<double>).
    Real path decodes PNG and baseline/progressive JPEG payloads
    (operators/codecs.py, operators/jpeg.py); ``fake=True`` keeps the
    deterministic stub for formats without a decoder.

    ``on_error='skip'`` is the web-corpus mode: a payload that fails to
    decode (corrupt bytes, arithmetic-coded JPEG, unknown format) yields
    its row with NULL width/height/features and the error in an extra
    ``decode_error`` string column, instead of failing the whole job —
    at 100 TB some fraction of scraped images is always broken, and one
    bad byte must not kill a stage. Count/inspect errors downstream with
    ``df.filter("decode_error IS NOT NULL")``. The default ``'raise'``
    keeps the strict schema (no extra column) and fail-fast semantics."""
    if on_error not in ("raise", "skip"):
        raise ValueError(f"on_error must be 'raise' or 'skip': {on_error}")
    skip = on_error == "skip"

    def run(batches: Iterable[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for b in batches:
            payloads = [bytes(p) if p is not None else b""
                        for p in b[payload_col]]
            rows, errs = [], []
            for p in payloads:
                try:
                    rows.append((_fake_decode if fake else _real_decode)(p))
                    errs.append(None)
                except Exception as e:  # noqa: BLE001 — skip mode records
                    if not skip:
                        raise
                    rows.append({"width": None, "height": None,
                                 "features": None})
                    errs.append(f"{type(e).__name__}: {e}")
            out = {
                id_col: b[id_col],
                "width": pd.array([r["width"] for r in rows],
                                  dtype="Int32"),
                "height": pd.array([r["height"] for r in rows],
                                   dtype="Int32"),
                "features": [r["features"] for r in rows],
            }
            if skip:
                out["decode_error"] = errs
            yield pd.DataFrame(out)

    out_schema = f"{id_col} long, width int, height int, features array<double>"
    if skip:
        out_schema += ", decode_error string"
    return df.select(id_col, payload_col).mapInPandas(run, schema=out_schema)


def decode_audio(df: DataFrame, payload_col: str = "payload",
                 id_col: str = "media_id",
                 on_error: str = "raise") -> DataFrame:
    """Arrow-batched WAV decode (REAL — stdlib ``wave``):
    (id, sample_rate, channels, duration_ms, features[mean, std, rms]).
    ``on_error='skip'`` mirrors decode_images: a corrupt payload keeps
    its row with NULL outputs and the error in a ``decode_error``
    column instead of failing the stage."""
    if on_error not in ("raise", "skip"):
        raise ValueError(f"on_error must be 'raise' or 'skip': {on_error}")
    skip = on_error == "skip"

    def run(batches: Iterable[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from iceberg_cpp_spark.operators import codecs

        for b in batches:
            ids, rates, chans, durs, feats, errs = [], [], [], [], [], []
            for mid, p in zip(b[id_col], b[payload_col]):
                ids.append(mid)
                try:
                    d = codecs.decode_wav(bytes(p) if p is not None else b"")
                    s = d["samples"].astype(np.float64)
                    rates.append(d["sample_rate"])
                    chans.append(d["channels"])
                    durs.append(d["duration_ms"])
                    feats.append([
                        float(s.mean()) if s.size else 0.0,
                        float(s.std()) if s.size else 0.0,
                        float(np.sqrt(np.mean(s * s))) if s.size else 0.0])
                    errs.append(None)
                except Exception as e:  # noqa: BLE001 — skip mode records
                    if not skip:
                        raise
                    rates.append(None)
                    chans.append(None)
                    durs.append(None)
                    feats.append(None)
                    errs.append(f"{type(e).__name__}: {e}")
            out = {
                id_col: pd.Series(ids, dtype="int64"),
                "sample_rate": pd.array(rates, dtype="Int32"),
                "channels": pd.array(chans, dtype="Int32"),
                "duration_ms": pd.array(durs, dtype="Int64"),
                "features": feats,
            }
            if skip:
                out["decode_error"] = errs
            yield pd.DataFrame(out)

    out_schema = (f"{id_col} long, sample_rate int, channels int, "
                  "duration_ms long, features array<double>")
    if skip:
        out_schema += ", decode_error string"
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


def gif_frames(df: DataFrame, payload_col: str = "payload",
               id_col: str = "media_id", max_frames: int = 256,
               emit_png: bool = False,
               on_error: str = "raise") -> DataFrame:
    """REAL animated-GIF frame extraction (operators/codecs.py
    decode_gif_frames — GIF89a disposal-method compositing, frame-bomb
    capped at ``max_frames``): one output row per composited frame
    (id, frame_idx, ts_ms, width, height, mean_luma; plus a
    ``frame_png`` binary column with the canvas re-encoded as PNG when
    ``emit_png`` — the decode→re-encode shape a training-data pipeline
    feeds to image models). ``ts_ms`` is the cumulative GIF delay
    timeline. ``on_error='skip'`` mirrors decode_images: a corrupt
    payload yields ONE row with null frame fields and the typed error
    in ``decode_error`` instead of failing the stage."""
    if on_error not in ("raise", "skip"):
        raise ValueError(f"on_error must be 'raise' or 'skip': {on_error}")
    skip = on_error == "skip"

    def run(batches: Iterable[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from iceberg_cpp_spark.operators.codecs import (
            decode_gif_frames, encode_png)

        for b in batches:
            cols: dict = {id_col: [], "frame_idx": [], "ts_ms": [],
                          "width": [], "height": [], "mean_luma": []}
            if emit_png:
                cols["frame_png"] = []
            if skip:
                cols["decode_error"] = []

            def emit(mid, idx, ts, w, h, luma, png, err):
                cols[id_col].append(mid)
                cols["frame_idx"].append(idx)
                cols["ts_ms"].append(ts)
                cols["width"].append(w)
                cols["height"].append(h)
                cols["mean_luma"].append(luma)
                if emit_png:
                    cols["frame_png"].append(png)
                if skip:
                    cols["decode_error"].append(err)

            for mid, p in zip(b[id_col], b[payload_col]):
                payload = bytes(p) if p is not None else b""
                try:
                    d = decode_gif_frames(payload, max_frames=max_frames)
                except Exception as e:  # noqa: BLE001 — skip mode records
                    if not skip:
                        raise
                    emit(mid, None, None, None, None, None, None,
                         f"{type(e).__name__}: {e}")
                    continue
                ts = 0
                for i, fr in enumerate(d["frames"]):
                    luma = float(
                        0.299 * fr[:, :, 0].mean()
                        + 0.587 * fr[:, :, 1].mean()
                        + 0.114 * fr[:, :, 2].mean())
                    emit(mid, i, ts, d["width"], d["height"],
                         round(luma, 6),
                         encode_png(fr) if emit_png else None, None)
                    ts += d["delays_ms"][i]
            out = pd.DataFrame(cols)
            out["frame_idx"] = pd.array(out["frame_idx"], dtype="Int32")
            out["ts_ms"] = pd.array(out["ts_ms"], dtype="Int64")
            out["width"] = pd.array(out["width"], dtype="Int32")
            out["height"] = pd.array(out["height"], dtype="Int32")
            yield out

    out_schema = (f"{id_col} long, frame_idx int, ts_ms long, "
                  "width int, height int, mean_luma double")
    if emit_png:
        out_schema += ", frame_png binary"
    if skip:
        out_schema += ", decode_error string"
    return df.select(id_col, payload_col).mapInPandas(run, schema=out_schema)


def resize_images(df: DataFrame, width: int, height: int,
                  payload_col: str = "payload", id_col: str = "media_id",
                  fake: bool = False, on_error: str = "raise") -> DataFrame:
    """Resize (id, payload) → (id, resized binary). Real path: decode →
    nearest-neighbor resample → re-encode in the SAME format (PNG stays
    PNG, JPEG — baseline or progressive — re-encodes as baseline JPEG).
    ``fake=True`` keeps the digest stub for unsupported payloads.
    ``on_error='skip'`` mirrors decode_images: a failing payload keeps
    its row with NULL ``resized`` and the error in a ``resize_error``
    column instead of killing the stage (the 100 TB web-corpus mode)."""
    if on_error not in ("raise", "skip"):
        raise ValueError(f"on_error must be 'raise' or 'skip': {on_error}")
    skip = on_error == "skip"

    def _one(payload: bytes, codecs) -> bytes:
        if fake:
            return hashlib.sha256(
                payload + struct.pack("<II", width, height)).digest()
        if codecs.is_png(payload):
            d = codecs.decode_png(payload)
            return codecs.encode_png(
                codecs.resize_nearest(d["pixels"], width, height))
        if codecs.is_jpeg(payload):
            d = codecs.decode_jpeg(payload)
            return codecs.encode_jpeg(
                codecs.resize_nearest(d["pixels"], width, height))
        if codecs.is_gif(payload):
            # no GIF encoder: resized GIFs re-encode losslessly as PNG
            d = codecs.decode_gif(payload)
            return codecs.encode_png(
                codecs.resize_nearest(d["pixels"], width, height))
        raise NotImplementedError(
            "real resize supports PNG, JPEG, and GIF; pass fake=True "
            "for the stub")

    def run(batches: Iterable[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from iceberg_cpp_spark.operators import codecs

        for b in batches:
            out, errs = [], []
            for p in b[payload_col]:
                payload = bytes(p) if p is not None else b""
                try:
                    out.append(_one(payload, codecs))
                    errs.append(None)
                except Exception as e:  # noqa: BLE001 — skip mode records
                    if not skip:
                        raise
                    out.append(None)
                    errs.append(f"{type(e).__name__}: {e}")
            res = {id_col: b[id_col], "resized": out}
            if skip:
                res["resize_error"] = errs
            yield pd.DataFrame(res)

    schema = f"{id_col} long, resized binary"
    if skip:
        schema += ", resize_error string"
    return df.select(id_col, payload_col).mapInPandas(run, schema=schema)

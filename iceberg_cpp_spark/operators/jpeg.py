"""Dependency-free baseline JPEG codec (numpy only).

Closes the JPEG gap in the multimodal operators (VERDICT r06 task 9):
a training-data pipeline over web images hits JPEG first, and no
PIL/opencv exists in this environment. Implemented from the public
ITU-T T.81 (JPEG) spec:

- ``decode_jpeg``: baseline sequential DCT (SOF0/1) AND progressive
  (SOF2, T.81 §G: spectral selection + successive approximation,
  DC/AC first + refinement scans, EOB runs), 8-bit — full marker walk
  (DQT/DHT/SOF/SOS/DRI + restart markers), canonical Huffman decode
  with byte-stuffing, dequantize + zigzag + orthonormal-matrix IDCT,
  chroma upsampling for any sampling factors (4:4:4, 4:2:0, 4:2:2),
  YCbCr→RGB. Grayscale and 3-component scans. Arithmetic coding,
  hierarchical, and lossless SOFs raise NotImplementedError.
- ``encode_jpeg``: baseline encoder for fixtures/round-trips — Annex K
  quantization tables with libjpeg-style quality scaling, 4:4:4 /
  4:2:0 / 4:2:2 sampling, and canonical fixed-length Huffman tables
  built from the symbols actually emitted (legal per the spec;
  compactness is not the goal, correctness and zero hardcoded
  162-entry tables are). FDCT is batched per component; the bit writer
  fuses huffman code + value bits into one call per symbol.

Like codecs.py (PNG/WAV), everything is numpy in/out; Spark callers run
these inside Arrow-batched ``mapInPandas``.
"""

from __future__ import annotations

import struct
from functools import lru_cache

import numpy as np

# --- shared constants -------------------------------------------------------

# zigzag scan order: ZIGZAG[k] = (row, col) of the k-th coefficient
def _zigzag() -> list:
    out = []
    for s in range(15):
        rng = (range(min(s, 7), max(0, s - 7) - 1, -1) if s % 2 == 0
               else range(max(0, s - 7), min(s, 7) + 1))
        out.extend((r, s - r) for r in rng)
    return out


ZIGZAG = _zigzag()
_ZZ_FLAT = np.array([r * 8 + c for r, c in ZIGZAG])
_ZZ_LIST = _ZZ_FLAT.tolist()  # plain-int variant for the hot decode loops

# Annex K.1 base quantization tables
QT_LUMA = np.array([
    16, 11, 10, 16, 24, 40, 51, 61,
    12, 12, 14, 19, 26, 58, 60, 55,
    14, 13, 16, 24, 40, 57, 69, 56,
    14, 17, 22, 29, 51, 87, 80, 62,
    18, 22, 37, 56, 68, 109, 103, 77,
    24, 35, 55, 64, 81, 104, 113, 92,
    49, 64, 78, 87, 103, 121, 120, 101,
    72, 92, 95, 98, 112, 100, 103, 99], dtype=np.int32).reshape(8, 8)
QT_CHROMA = np.array([
    17, 18, 24, 47, 99, 99, 99, 99,
    18, 21, 26, 66, 99, 99, 99, 99,
    24, 26, 56, 99, 99, 99, 99, 99,
    47, 66, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99], dtype=np.int32).reshape(8, 8)


def _dct_matrix() -> np.ndarray:
    """Orthonormal DCT-II basis: fwd = A @ B @ A.T, inv = A.T @ C @ A."""
    k = np.arange(8).reshape(8, 1)
    n = np.arange(8).reshape(1, 8)
    A = np.cos((2 * n + 1) * k * np.pi / 16) * np.sqrt(2 / 8)
    A[0] /= np.sqrt(2)
    return A


_A = _dct_matrix()


def is_jpeg(payload: bytes) -> bool:
    return payload[:2] == b"\xff\xd8"


# --- decoder ----------------------------------------------------------------

class _Bits:
    """Entropy-segment bit reader with 0xFF00 byte-stuffing; stops (zero
    padding) at any real marker so a truncated stream degrades cleanly.
    Bits accumulate in an int buffer so Huffman decode can PEEK 16 bits
    at once (the table-driven fast path below) instead of looping
    bit-by-bit; marker bytes are never pulled into the buffer, so
    ``self.i`` always points at the next unread stream byte."""

    def __init__(self, data: bytes, pos: int):
        self.d = data
        self.i = pos
        self.acc = 0   # bit accumulator, MSB-first
        self.n = 0     # live bits in acc

    def _fill(self, need: int) -> None:
        d, i, n, acc = self.d, self.i, self.n, self.acc
        acc &= (1 << n) - 1  # drop consumed high bits — keeps acc small
        ln = len(d)
        while n < need:
            if i >= ln:
                acc = (acc << 8)  # zero padding past the end
                n += 8
                continue
            b = d[i]
            if b == 0xFF:
                nxt = d[i + 1] if i + 1 < ln else 0xD9
                if nxt == 0x00:
                    acc = (acc << 8) | 0xFF
                    n += 8
                    i += 2
                else:  # a marker: stop consuming, emit zeros
                    acc = (acc << 8)
                    n += 8
            else:
                acc = (acc << 8) | b
                n += 8
                i += 1
        self.i, self.n, self.acc = i, n, acc

    def bit(self) -> int:
        if self.n == 0:
            self._fill(1)
        self.n -= 1
        return (self.acc >> self.n) & 1

    def receive(self, s: int) -> int:
        if s == 0:
            return 0
        if self.n < s:
            self._fill(s)
        self.n -= s
        return (self.acc >> self.n) & ((1 << s) - 1)

    def peek(self, s: int) -> int:
        if self.n < s:
            self._fill(s)
        return (self.acc >> (self.n - s)) & ((1 << s) - 1)

    def restart(self) -> None:
        """Byte-align and consume one RSTn marker (T.81 §B.2.1.2)."""
        self.n = 0
        self.acc = 0
        while self.i + 1 < len(self.d):
            if self.d[self.i] == 0xFF and 0xD0 <= self.d[self.i + 1] <= 0xD7:
                self.i += 2
                return
            self.i += 1


def _extend(v: int, s: int) -> int:
    """T.81 F.2.2.1 sign extension of an s-bit magnitude."""
    return v - (1 << s) + 1 if s and v < (1 << (s - 1)) else v


def _build_huff(bits: list, vals: list) -> tuple:
    """Canonical Huffman → full-lookahead LUTs (libjpeg-style fast
    path), sized to the table's LONGEST code: ``sym[peek(maxlen)]`` is
    the decoded value, ``size[...]`` the code length to consume (0 =
    invalid code). One peek + one list index per symbol — no bit loop."""
    maxlen = max((ln for ln in range(1, 17) if bits[ln - 1]), default=1)
    sym = [0] * (1 << maxlen)
    size = [0] * (1 << maxlen)
    code = 0
    k = 0
    for ln in range(1, maxlen + 1):
        for _ in range(bits[ln - 1]):
            start = code << (maxlen - ln)
            end = (code + 1) << (maxlen - ln)
            sym[start:end] = [vals[k]] * (end - start)
            size[start:end] = [ln] * (end - start)
            code += 1
            k += 1
        code <<= 1
    return sym, size, maxlen


def _huff_decode(r: _Bits, table: tuple) -> int:
    sym, size, ml = table
    v = r.peek(ml)
    ln = size[v]
    if ln == 0:
        raise ValueError("invalid JPEG huffman code")
    r.n -= ln
    return sym[v]


# dimension sanity cap: a corrupt/hostile header claiming huge dims
# would otherwise make the pure-python scan loop grind for minutes and
# allocate GBs — a decompression-bomb vector in a web-corpus pipeline.
# 64 MPix covers any real photograph; callers can raise it explicitly.
MAX_PIXELS = 64_000_000


def decode_jpeg(payload: bytes, max_pixels: int = MAX_PIXELS) -> dict:
    """Baseline or progressive JPEG → {width, height, channels,
    pixels(h,w,c) uint8}.  Baseline (SOF0/1) decodes scan-at-once;
    progressive (SOF2, T.81 §G) accumulates coefficients across
    spectral-selection / successive-approximation scans and
    reconstructs after EOI.

    Error contract: a payload this codec cannot decode raises
    ``ValueError`` (corrupt/truncated/non-JPEG) or
    ``NotImplementedError`` (valid but unsupported coding mode) — never
    a raw parse exception. That is what ``decode_images(on_error=
    'skip')`` relies on to classify failures at corpus scale."""
    try:
        return _decode_jpeg(payload, max_pixels)
    except (ValueError, NotImplementedError):
        raise
    except (IndexError, KeyError, StopIteration, ZeroDivisionError,
            struct.error, TypeError) as e:
        # corrupt streams trip low-level parse errors in the marker walk
        # / huffman tables / scan geometry; normalize at the boundary.
        # TypeError included: a scan referencing an undefined Huffman
        # table (huff_dc.get() → None unpacked) or SOS-before-SOF
        # (None dimensions) surfaces as TypeError, not KeyError
        raise ValueError(
            f"corrupt JPEG ({type(e).__name__}: {e})") from e


def _decode_jpeg(payload: bytes, max_pixels: int) -> dict:
    if not is_jpeg(payload):
        raise ValueError("not a JPEG (bad SOI)")
    qt: dict[int, np.ndarray] = {}
    huff_dc: dict[int, dict] = {}
    huff_ac: dict[int, dict] = {}
    comps: list[dict] = []
    width = height = None
    restart_interval = 0
    progressive = False
    prog: dict = {}
    i = 2
    while i + 4 <= len(payload):
        if payload[i] != 0xFF:
            i += 1
            continue
        marker = payload[i + 1]
        if marker in (0xD8, 0x01) or 0xD0 <= marker <= 0xD7:
            i += 2
            continue
        if marker == 0xD9:  # EOI: parameterless — stop the walk cleanly
            break
        (seglen,) = struct.unpack_from(">H", payload, i + 2)
        seg = payload[i + 4:i + 2 + seglen]
        i += 2 + seglen
        if marker == 0xDB:  # DQT
            p = 0
            while p < len(seg):
                pq, tq = seg[p] >> 4, seg[p] & 15
                p += 1
                if pq:  # 16-bit table
                    vals = np.frombuffer(seg, ">u2", 64, p).astype(np.int32)
                    p += 128
                else:
                    vals = np.frombuffer(seg, np.uint8, 64, p).astype(np.int32)
                    p += 64
                t = np.zeros((8, 8), np.int32)
                for k, (rr, cc) in enumerate(ZIGZAG):
                    t[rr, cc] = vals[k]
                qt[tq] = t
        elif marker == 0xC4:  # DHT
            p = 0
            while p < len(seg):
                tc, th = seg[p] >> 4, seg[p] & 15
                bits = list(seg[p + 1:p + 17])
                n = sum(bits)
                vals = list(seg[p + 17:p + 17 + n])
                (huff_dc if tc == 0 else huff_ac)[th] = _build_huff(bits, vals)
                p += 17 + n
        elif marker in (0xC0, 0xC1, 0xC2):  # SOF0/1 baseline, SOF2 progressive
            prec, height, width, nc = struct.unpack_from(">BHHB", seg, 0)
            if prec != 8:
                raise NotImplementedError(f"JPEG precision {prec} (only 8)")
            if nc not in (1, 3):
                # 4-component CMYK/YCCK (Adobe) would silently get the
                # YCbCr->RGB transform applied to the wrong channels —
                # refuse instead of mis-decoding
                raise NotImplementedError(
                    f"JPEG with {nc} components (only grayscale/YCbCr)")
            if width * height > max_pixels or width == 0 or height == 0:
                raise ValueError(
                    f"JPEG dimensions {width}x{height} outside sanity "
                    f"bounds (max_pixels={max_pixels})")
            comps = []
            for c in range(nc):
                cid, hv, tq = struct.unpack_from(">BBB", seg, 6 + 3 * c)
                comps.append({"id": cid, "h": hv >> 4, "v": hv & 15, "tq": tq})
            if marker == 0xC2:
                progressive = True
                prog = _prog_state(comps, width, height)
        elif marker in (0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB,
                        0xCD, 0xCE, 0xCF):
            raise NotImplementedError(
                f"JPEG SOF{marker - 0xC0}: only baseline sequential "
                "(SOF0/1) and progressive (SOF2)")
        elif marker == 0xDD:  # DRI
            (restart_interval,) = struct.unpack_from(">H", seg, 0)
        elif marker == 0xDA:  # SOS — entropy data follows
            ns = seg[0]
            if not progressive:
                scan = []
                for c in range(ns):
                    cs, tt = seg[1 + 2 * c], seg[2 + 2 * c]
                    comp = next(x for x in comps if x["id"] == cs)
                    scan.append((comp, huff_dc[tt >> 4], huff_ac[tt & 15]))
                return _decode_scan(payload, i, scan, qt, width, height,
                                    restart_interval)
            ss, se, ahal = seg[1 + 2 * ns], seg[2 + 2 * ns], seg[3 + 2 * ns]
            members = []
            for c in range(ns):
                cs, tt = seg[1 + 2 * c], seg[2 + 2 * c]
                ci = next(k for k, x in enumerate(comps) if x["id"] == cs)
                table = (huff_dc.get(tt >> 4) if ss == 0
                         else huff_ac.get(tt & 15))
                members.append((ci, table))
            i = _decode_prog_scan(payload, i, members, prog,
                                  ss, se, ahal >> 4, ahal & 15,
                                  restart_interval)
        # all other markers (APPn, COM) skipped
    if progressive and prog.get("n_scans"):
        return _reconstruct_progressive(prog, comps, qt, width, height)
    raise ValueError("JPEG missing SOS")


def _decode_scan(payload, pos, scan, qt, width, height, ri) -> dict:
    """Baseline single-scan decode: one MCU-interleaved entropy pass
    fills natural-order coefficient lists (pure-int inner loop), then
    the shared vectorized dequant+IDCT+upsample reconstruction runs
    once over all blocks (same back end as the progressive path)."""
    comps = [c for c, _, _ in scan]
    prog = _prog_state(comps, width, height)
    preds = [0] * len(scan)
    r = _Bits(payload, pos)
    n_mcu = 0
    for my in range(prog["mcuy"]):
        for mx in range(prog["mcux"]):
            if ri and n_mcu and n_mcu % ri == 0:
                r.restart()
                preds = [0] * len(scan)
            n_mcu += 1
            for ci, (c, hdc, hac) in enumerate(scan):
                rows = prog["coef"][ci]
                for by in range(c["v"]):
                    for bx in range(c["h"]):
                        blk = rows[my * c["v"] + by][mx * c["h"] + bx]
                        s = _huff_decode(r, hdc)
                        preds[ci] += _extend(r.receive(s), s)
                        blk[0] = preds[ci]
                        k = 1
                        while k < 64:
                            rs = _huff_decode(r, hac)
                            run, size = rs >> 4, rs & 15
                            if size == 0:
                                if run != 15:
                                    break  # EOB
                                k += 16
                                continue
                            k += run
                            if k > 63:
                                break
                            blk[_ZZ_LIST[k]] = _extend(r.receive(size), size)
                            k += 1
    return _reconstruct_progressive(prog, comps, qt, width, height)


# --- progressive decoder (T.81 §G.1.2 / §G.2) -------------------------------

def _prog_state(comps: list, width: int, height: int) -> dict:
    """Per-component natural-order coefficient arrays, sized to the full
    interleaved MCU grid (DC scans address padding blocks; AC scans only
    touch the non-interleaved sub-grid)."""
    hmax = max(c["h"] for c in comps)
    vmax = max(c["v"] for c in comps)
    mcux = -(-width // (8 * hmax))
    mcuy = -(-height // (8 * vmax))
    st = {"hmax": hmax, "vmax": vmax, "mcux": mcux, "mcuy": mcuy,
          "coef": [], "nblk": [], "n_scans": 0}
    for c in comps:
        cw = -(-width * c["h"] // hmax)    # component resolution
        ch = -(-height * c["v"] // vmax)
        # nested python lists, not numpy: the entropy decode touches
        # coefficients one at a time, where list indexing is ~10x faster
        # than numpy scalar access; reconstruct converts wholesale
        st["coef"].append([[[0] * 64 for _ in range(mcux * c["h"])]
                           for _ in range(mcuy * c["v"])])
        st["nblk"].append((-(-ch // 8), -(-cw // 8)))  # ≤ padded grid
    return st


def _decode_prog_scan(payload, pos, members, prog, ss, se, ah, al, ri) -> int:
    """One progressive scan into the coefficient state; returns the
    payload offset just past this scan's entropy data. DC scans
    (ss==0) may be interleaved; AC scans are single-component per
    T.81 §G.1.1."""
    r = _Bits(payload, pos)
    prog["n_scans"] += 1
    eob = [0]  # EOB run carries across blocks within the scan

    def dc_first(ci, table, by, bx, preds):
        s = _huff_decode(r, table)
        preds[ci] += _extend(r.receive(s), s)
        prog["coef"][ci][by][bx][0] = preds[ci] << al

    def dc_refine(ci, by, bx):
        if r.bit():
            prog["coef"][ci][by][bx][0] |= (1 << al)

    def ac_first(ci, table, by, bx):
        blk = prog["coef"][ci][by][bx]
        if eob[0] > 0:
            eob[0] -= 1
            return
        k = ss
        while k <= se:
            rs = _huff_decode(r, table)
            run, size = rs >> 4, rs & 15
            if size == 0:
                if run != 15:
                    eob[0] = (1 << run) - 1 + (r.receive(run) if run else 0)
                    return
                k += 16  # ZRL
                continue
            k += run
            if k > se:
                return  # corrupt run past the band: drop the rest
            blk[_ZZ_LIST[k]] = _extend(r.receive(size), size) << al
            k += 1

    p1, m1 = 1 << al, -1 << al

    def _refine_nonzero(blk, k):
        z = _ZZ_LIST[k]
        v = blk[z]
        if v and r.bit() and not (v & p1):
            blk[z] = v + (p1 if v > 0 else m1)

    def ac_refine(ci, table, by, bx):
        """T.81 §G.1.2.3 (the jdphuff 'refinement' algorithm): newly
        nonzero coefficients arrive as ±1<<al; already-nonzero ones get
        one correction bit each as the scan passes over them."""
        blk = prog["coef"][ci][by][bx]
        k = ss
        if eob[0] == 0:
            while k <= se:
                rs = _huff_decode(r, table)
                run, size = rs >> 4, rs & 15
                newval = 0
                if size == 0:
                    if run != 15:
                        eob[0] = (1 << run) + (r.receive(run) if run else 0)
                        break
                else:  # size is 1 by construction in refinement scans
                    newval = p1 if r.bit() else m1
                while k <= se:
                    if blk[_ZZ_LIST[k]]:
                        _refine_nonzero(blk, k)
                    else:
                        if run == 0:
                            if newval:
                                blk[_ZZ_LIST[k]] = newval
                            k += 1
                            break
                        run -= 1
                    k += 1
        if eob[0] > 0:
            while k <= se:
                _refine_nonzero(blk, k)
                k += 1
            eob[0] -= 1

    interleaved = len(members) > 1
    if ss == 0:
        preds = [0] * len(prog["coef"])
        if interleaved:
            n = 0
            for my in range(prog["mcuy"]):
                for mx in range(prog["mcux"]):
                    if ri and n and n % ri == 0:
                        r.restart()
                        preds = [0] * len(prog["coef"])
                    n += 1
                    for ci, table in members:
                        c = prog["coef"][ci]
                        v = len(c) // prog["mcuy"]
                        h = len(c[0]) // prog["mcux"]
                        for by in range(v):
                            for bx in range(h):
                                if ah == 0:
                                    dc_first(ci, table, my * v + by,
                                             mx * h + bx, preds)
                                else:
                                    dc_refine(ci, my * v + by, mx * h + bx)
        else:
            ci, table = members[0]
            bh, bw = prog["nblk"][ci]
            n = 0
            for by in range(bh):
                for bx in range(bw):
                    if ri and n and n % ri == 0:
                        r.restart()
                        preds = [0] * len(prog["coef"])
                    n += 1
                    if ah == 0:
                        dc_first(ci, table, by, bx, preds)
                    else:
                        dc_refine(ci, by, bx)
    else:
        ci, table = members[0]
        bh, bw = prog["nblk"][ci]
        n = 0
        for by in range(bh):
            for bx in range(bw):
                if ri and n and n % ri == 0:
                    r.restart()
                    eob[0] = 0
                n += 1
                if ah == 0:
                    ac_first(ci, table, by, bx)
                else:
                    ac_refine(ci, table, by, bx)
    # skip to the next marker (r.i may sit mid-entropy after the last
    # needed bit; stuffed FF00 and RSTn belong to this scan's data)
    j = r.i
    while j + 1 < len(payload):
        if payload[j] == 0xFF and payload[j + 1] != 0x00 \
                and not (0xD0 <= payload[j + 1] <= 0xD7):
            return j
        j += 1
    return len(payload)


def _reconstruct_progressive(prog, comps, qt, width, height) -> dict:
    hmax, vmax = prog["hmax"], prog["vmax"]
    out = []
    for ci, c in enumerate(comps):
        bh, bw = prog["nblk"][ci]
        q = qt[c["tq"]].reshape(-1).astype(np.float64)
        # vectorized dequant + IDCT over all blocks at once
        coefs = np.array(prog["coef"][ci], dtype=np.float64)[:bh, :bw]
        blocks = (coefs.reshape(-1, 64) * q).reshape(-1, 8, 8)
        # batched matmul instead of einsum: identical math, ~15x less
        # per-call dispatch overhead on the small (nblk, 8, 8) stacks
        # this codec sees (r17 measurement)
        px = np.matmul(np.matmul(_A.T, blocks), _A) + 128.0
        plane = (px.reshape(bh, bw, 8, 8)
                 .transpose(0, 2, 1, 3).reshape(bh * 8, bw * 8))
        cw = -(-width * c["h"] // hmax)
        ch = -(-height * c["v"] // vmax)
        plane = plane[:ch, :cw]
        if c["h"] != hmax or c["v"] != vmax:
            plane = np.repeat(np.repeat(plane, vmax // c["v"], 0),
                              hmax // c["h"], 1)
        out.append(plane[:height, :width])
    if len(out) == 1:
        pixels = np.clip(np.round(out[0]), 0, 255).astype(np.uint8)[:, :, None]
        return {"width": width, "height": height, "channels": 1,
                "pixels": pixels}
    y, cb, cr = out[0], out[1] - 128.0, out[2] - 128.0
    rgb = np.stack([y + 1.402 * cr,
                    y - 0.344136 * cb - 0.714136 * cr,
                    y + 1.772 * cb], axis=2)
    return {"width": width, "height": height, "channels": 3,
            "pixels": np.clip(np.round(rgb), 0, 255).astype(np.uint8)}


# --- encoder ----------------------------------------------------------------

class _BitWriter:
    def __init__(self):
        self.out = bytearray()
        self.acc = 0
        self.n = 0

    def write(self, code: int, length: int) -> None:
        acc = (self.acc << length) | (code & ((1 << length) - 1))
        n = self.n + length
        out = self.out
        while n >= 8:
            n -= 8
            b = (acc >> n) & 0xFF
            out.append(b)
            if b == 0xFF:
                out.append(0x00)  # byte stuffing
        # trim flushed high bits — an untrimmed accumulator grows into a
        # big int and makes every write O(bits written so far)
        self.acc = acc & ((1 << n) - 1)
        self.n = n

    def flush(self) -> None:
        if self.n:
            self.write(0x7F, 7 - ((self.n - 1) % 8) + 1)  # pad with 1s


@lru_cache(maxsize=64)
def _quality_tables(quality: int) -> tuple:
    quality = min(max(int(quality), 1), 100)
    scale = 5000 // quality if quality < 50 else 200 - 2 * quality
    lq = np.clip((QT_LUMA * scale + 50) // 100, 1, 255).astype(np.int32)
    cq = np.clip((QT_CHROMA * scale + 50) // 100, 1, 255).astype(np.int32)
    return lq, cq


def _size_cat(v: int) -> int:
    return v.bit_length() if v > 0 else (-v).bit_length()


def _comp_zz_blocks(plane: np.ndarray, q: np.ndarray) -> list:
    """Batch FDCT + quantize a padded component plane → per-block
    zigzag-order int lists (one numpy pass for the whole component; the
    per-block symbol walk then runs on plain ints)."""
    bh, bw = plane.shape[0] // 8, plane.shape[1] // 8
    blocks = (plane.reshape(bh, 8, bw, 8).transpose(0, 2, 1, 3)
              .reshape(-1, 8, 8) - 128.0)
    # batched matmul == the einsum contraction, minus its dispatch cost
    coef = np.matmul(np.matmul(_A, blocks), _A.T)
    zz = np.round(coef.reshape(-1, 64) / q.reshape(-1)).astype(np.int64)
    return zz[:, _ZZ_FLAT].tolist()


def _block_symbols(zz: list, pred: int):
    """One quantized block (zigzag int list) → (dc, symbol list).
    Symbols: ('dc', size, bitsval) then ('ac', rs, size, bitsval)."""
    dc = zz[0]
    diff = dc - pred
    s = _size_cat(diff)
    syms = [("dc", s, diff if diff >= 0 else diff + (1 << s) - 1)]
    run = 0
    last = 63
    while last > 0 and zz[last] == 0:
        last -= 1
    for k in range(1, last + 1):
        v = zz[k]
        if v == 0:
            run += 1
            continue
        while run > 15:
            syms.append(("ac", 0xF0, 0, 0))  # ZRL
            run -= 16
        s = _size_cat(v)
        syms.append(("ac", (run << 4) | s, s,
                     v if v >= 0 else v + (1 << s) - 1))
        run = 0
    if last < 63:
        syms.append(("ac", 0x00, 0, 0))  # EOB
    return dc, syms


def _fixed_huff(symbols: set) -> tuple:
    """All-same-length canonical Huffman over the used symbols (legal,
    typo-proof alternative to hardcoding the Annex K tables). Reserves
    the all-ones code per T.81 C.2."""
    vals = sorted(symbols)
    ln = max((len(vals)).bit_length(), 2)  # need 2^ln - 1 >= len(vals)
    while (1 << ln) - 1 < len(vals):
        ln += 1
    bits = [0] * 16
    bits[ln - 1] = len(vals)
    enc = {v: (ln, code) for code, v in enumerate(vals)}
    return bits, vals, enc


def _dht_segment(tc: int, th: int, bits: list, vals: list) -> bytes:
    body = bytes([tc << 4 | th]) + bytes(bits) + bytes(vals)
    return b"\xff\xc4" + struct.pack(">H", 2 + len(body)) + body


def _dqt_segment(tq: int, table: np.ndarray) -> bytes:
    zz = table.reshape(-1)[_ZZ_FLAT]
    body = bytes([tq]) + bytes(int(x) for x in zz)
    return b"\xff\xdb" + struct.pack(">H", 2 + len(body)) + body


def encode_jpeg(pixels: np.ndarray, quality: int = 90,
                subsampling: str = "444") -> bytes:
    """Baseline JPEG encode of (h,w) gray, (h,w,1) or (h,w,3) RGB.
    ``subsampling``: '444' (no chroma subsampling), '420' (2x2), or
    '422' (2x1 horizontal — the video-derived-frame convention)."""
    arr = np.asarray(pixels, dtype=np.float64)
    if arr.ndim == 2:
        arr = arr[:, :, None]
    h, w, nc = arr.shape
    if nc not in (1, 3):
        raise ValueError(f"encode_jpeg needs 1 or 3 channels, got {nc}")
    if subsampling not in ("444", "420", "422"):
        raise ValueError("subsampling must be '444', '420', or '422'")
    lq, cq = _quality_tables(quality)
    if nc == 3:
        r, g, b = arr[:, :, 0], arr[:, :, 1], arr[:, :, 2]
        planes = [0.299 * r + 0.587 * g + 0.114 * b,
                  -0.168736 * r - 0.331264 * g + 0.5 * b + 128.0,
                  0.5 * r - 0.418688 * g - 0.081312 * b + 128.0]
    else:
        planes = [arr[:, :, 0]]
    # luma (h, v) sampling factors; chroma is always (1, 1)
    sub = {"444": (1, 1), "420": (2, 2), "422": (2, 1)}[subsampling] \
        if nc == 3 else (1, 1)

    def pad(p, mh, mw):
        ph = -(-p.shape[0] // mh) * mh
        pw = -(-p.shape[1] // mw) * mw
        return np.pad(p, ((0, ph - p.shape[0]), (0, pw - p.shape[1])),
                      mode="edge")

    # component planes at their own resolution
    cplanes, factors, qts, qids = [], [], [], []
    fx, fy = sub[0], sub[1]  # chroma pool factors = luma sampling
    for ci, p in enumerate(planes):
        if ci == 0:
            cplanes.append(pad(p, 8 * fy, 8 * fx))
            factors.append(sub)
            qts.append(lq)
            qids.append(0)
        else:
            if (fx, fy) != (1, 1):  # average-pool chroma
                pp = pad(p, fy, fx)
                p = pp.reshape(pp.shape[0] // fy, fy,
                               pp.shape[1] // fx, fx).mean(axis=(1, 3))
            cplanes.append(pad(p, 8, 8))
            factors.append((1, 1))
            qts.append(cq)
            qids.append(1)

    hmax = max(f[0] for f in factors)
    vmax = max(f[1] for f in factors)
    mcux = -(-w // (8 * hmax))
    mcuy = -(-h // (8 * vmax))
    # pass 1: batch FDCT per component, then the MCU-interleaved symbol
    # walk over plain-int zigzag lists
    zz_comp = [_comp_zz_blocks(cplanes[ci], qts[ci]) for ci in range(nc)]
    bwc = [cplanes[ci].shape[1] // 8 for ci in range(nc)]
    preds = [0] * nc
    all_syms: list = []
    used = {("dc", 0): set(), ("ac", 0): set(),
            ("dc", 1): set(), ("ac", 1): set()}
    for my in range(mcuy):
        for mx in range(mcux):
            for ci in range(nc):
                hf, vf = factors[ci]
                tid = 0 if ci == 0 else 1
                dc_used, ac_used = used[("dc", tid)], used[("ac", tid)]
                for by in range(vf):
                    for bx in range(hf):
                        bi = (my * vf + by) * bwc[ci] + (mx * hf + bx)
                        preds[ci], syms = _block_symbols(
                            zz_comp[ci][bi], preds[ci])
                        all_syms.append((tid, syms))
                        for sym in syms:
                            if sym[0] == "dc":
                                dc_used.add(sym[1])
                            else:
                                ac_used.add(sym[1])
    tables = {}
    dht = b""
    n_tables = 2 if nc == 3 else 1
    for tid in range(n_tables):
        for cls in ("dc", "ac"):
            syms = used[(cls, tid)] or {0}
            bits, vals, enc = _fixed_huff(syms)
            tables[(cls, tid)] = enc
            dht += _dht_segment(0 if cls == "dc" else 1, tid, bits, vals)

    # headers
    out = bytearray(b"\xff\xd8")
    out += (b"\xff\xe0" + struct.pack(">H", 16) + b"JFIF\x00"
            + bytes([1, 1, 0]) + struct.pack(">HH", 1, 1) + bytes([0, 0]))
    out += _dqt_segment(0, lq)
    if nc == 3:
        out += _dqt_segment(1, cq)
    sof = struct.pack(">BHHB", 8, h, w, nc)
    for ci in range(nc):
        sof += bytes([ci + 1, factors[ci][0] << 4 | factors[ci][1], qids[ci]])
    out += b"\xff\xc0" + struct.pack(">H", 2 + len(sof)) + sof
    out += dht
    sos = bytes([nc])
    for ci in range(nc):
        tid = 0 if ci == 0 else 1
        sos += bytes([ci + 1, tid << 4 | tid])
    sos += bytes([0, 63, 0])
    out += b"\xff\xda" + struct.pack(">H", 2 + len(sos)) + sos

    # pass 2: entropy-coded data (huffman code + value bits fused into
    # one write per symbol — halves the bit-writer call count)
    wtr = _BitWriter()
    write = wtr.write
    for tid, syms in all_syms:
        dc_t, ac_t = tables[("dc", tid)], tables[("ac", tid)]
        for sym in syms:
            if sym[0] == "dc":
                _, s, bitsval = sym
                ln, code = dc_t[s]
            else:
                _, rs, s, bitsval = sym
                ln, code = ac_t[rs]
            write((code << s) | bitsval, ln + s)
    wtr.flush()
    out += wtr.out
    out += b"\xff\xd9"
    return bytes(out)

#!/usr/bin/env python
"""Generate the checked-in CMYK JPEG fixture
`assets/jpeg/cmyk_adobe_app14.jpg` (provenance: FIXTURES.md §F).

No libjpeg/Photoshop exists in this container, so the fixture is a
COMPLETE spec-constructed Adobe-style CMYK baseline JPEG, not just a
synthetic SOF header: SOI, APP14 "Adobe" (transform 0 = plain CMYK),
DQT, a 4-component SOF0, DHT, SOS, and genuine Huffman-coded
MCU-interleaved entropy data for all four components produced by the
same FDCT/quantize/symbol machinery `encode_jpeg` uses — a real JPEG
decoder can parse it end to end. Our decoder REFUSES 4-component files
at SOF (jpeg.py — the YCCK/inversion ambiguity makes silent
mis-decoding worse than refusal); this fixture proves the corpus-mode
behavior: `decode_images(on_error='skip')` yields one typed
`decode_error` row and zero stage failures
(tests/test_jpeg.py::TestCmykCorpusMode).
"""
import os
import struct
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from iceberg_cpp_spark.operators.jpeg import (  # noqa: E402
    _BitWriter,
    _block_symbols,
    _comp_zz_blocks,
    _dht_segment,
    _dqt_segment,
    _fixed_huff,
    _quality_tables,
)


def encode_cmyk_jpeg(cmyk: np.ndarray, quality: int = 90) -> bytes:
    """(h, w, 4) CMYK -> complete baseline JPEG with Adobe APP14
    (transform 0), 4:4:4, one shared quant + huffman table pair."""
    arr = np.asarray(cmyk, np.float64)
    h, w, nc = arr.shape
    assert nc == 4
    lq, _ = _quality_tables(quality)

    def pad(p):
        ph, pw = -(-p.shape[0] // 8) * 8, -(-p.shape[1] // 8) * 8
        return np.pad(p, ((0, ph - p.shape[0]), (0, pw - p.shape[1])),
                      mode="edge")

    zz_comp = [_comp_zz_blocks(pad(arr[:, :, c]), lq) for c in range(nc)]
    bw = -(-w // 8)
    preds = [0] * nc
    all_syms, dc_used, ac_used = [], set(), set()
    for my in range(-(-h // 8)):
        for mx in range(bw):
            for ci in range(nc):
                preds[ci], syms = _block_symbols(
                    zz_comp[ci][my * bw + mx], preds[ci])
                all_syms.append(syms)
                for s in syms:
                    (dc_used if s[0] == "dc" else ac_used).add(s[1])
    dbits, dvals, denc = _fixed_huff(dc_used or {0})
    abits, avals, aenc = _fixed_huff(ac_used or {0})

    out = bytearray(b"\xff\xd8")
    # APP14 Adobe: version 100, flags 0/0, transform 0 (plain CMYK)
    out += (b"\xff\xee" + struct.pack(">H", 14) + b"Adobe"
            + struct.pack(">HHHB", 100, 0, 0, 0))
    out += _dqt_segment(0, lq)
    sof = struct.pack(">BHHB", 8, h, w, nc)
    for ci in range(nc):
        sof += bytes([ci + 1, 0x11, 0])
    out += b"\xff\xc0" + struct.pack(">H", 2 + len(sof)) + sof
    out += _dht_segment(0, 0, dbits, dvals)
    out += _dht_segment(1, 0, abits, avals)
    sos = bytes([nc]) + b"".join(bytes([ci + 1, 0]) for ci in range(nc)) \
        + bytes([0, 63, 0])
    out += b"\xff\xda" + struct.pack(">H", 2 + len(sos)) + sos
    wtr = _BitWriter()
    for syms in all_syms:
        for s in syms:
            if s[0] == "dc":
                _, sz, bitsval = s
                ln, code = denc[sz]
            else:
                _, rs, sz, bitsval = s
                ln, code = aenc[rs]
            wtr.write((code << sz) | bitsval, ln + sz)
    wtr.flush()
    out += wtr.out
    out += b"\xff\xd9"
    return bytes(out)


def build() -> bytes:
    yy, xx = np.mgrid[0:32, 0:32]
    cmyk = np.stack([
        (xx * 8) % 256,          # C gradient
        (yy * 8) % 256,          # M gradient
        ((xx + yy) * 4) % 256,   # Y diagonal
        np.full((32, 32), 40),   # flat K
    ], axis=2).astype(np.float64)
    return encode_cmyk_jpeg(cmyk)


if __name__ == "__main__":
    path = os.path.join(os.path.dirname(__file__), "..",
                        "assets", "jpeg", "cmyk_adobe_app14.jpg")
    payload = build()
    with open(path, "wb") as f:
        f.write(payload)
    print(f"wrote {path} ({len(payload)} bytes)")

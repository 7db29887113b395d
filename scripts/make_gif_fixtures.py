#!/usr/bin/env python
"""Generate the checked-in animated-GIF fixture `assets/gif/
animated_disposal.gif` (provenance: FIXTURES.md §G).

The fixture is built with `operators/codecs.py encode_gif` (a real
dictionary-building GIF-LZW compressor — the encode direction of the
decoder, written independently from the GIF89a spec) and pinned in
`tests/test_multimodal_codecs.py::TestGifFrames` by HAND-DERIVED
golden pixels: the expected composited canvases below were worked out
on paper from GIF89a §23 disposal semantics, so a decoder bug cannot
hide behind encoder/decoder symmetry. Real-encoder (giflib) interop is
separately pinned by `assets/gif/python_giflib.gif`.

Layout (8x8 logical screen, GCT black/red/green/blue):
  frame 0: full-screen solid red, disposal 1 (keep),        delay 10cs
  frame 1: 4x4 green at (2,2) via a LOCAL color table,
           disposal 3 (restore-to-previous),                delay 20cs
  frame 2: 4x4 blue at (0,0), disposal 2 (restore-to-bg),   delay 30cs
  frame 3: full-screen checkerboard red/transparent,
           GCE transparent index 0, disposal 0,             delay 0
"""
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from iceberg_cpp_spark.operators import codecs  # noqa: E402

PALETTE = np.array(
    [[0, 0, 0], [255, 0, 0], [0, 255, 0], [0, 0, 255]], np.uint8)


def build() -> bytes:
    yy, xx = np.mgrid[0:8, 0:8]
    frames = [
        {"grid": np.full((8, 8), 1), "disposal": 1, "delay_cs": 10},
        {"grid": np.full((4, 4), 0), "left": 2, "top": 2, "disposal": 3,
         "delay_cs": 20,
         "local_palette": np.array([[0, 255, 0], [9, 9, 9]], np.uint8)},
        {"grid": np.full((4, 4), 3), "disposal": 2, "delay_cs": 30},
        {"grid": ((xx + yy) % 2 == 0).astype(np.uint8),
         "transparent": 0, "disposal": 0},
    ]
    return codecs.encode_gif(frames, 8, 8, PALETTE)


if __name__ == "__main__":
    out = os.path.join(os.path.dirname(__file__), "..",
                       "assets", "gif", "animated_disposal.gif")
    payload = build()
    with open(out, "wb") as f:
        f.write(payload)
    print(f"wrote {out} ({len(payload)} bytes)")

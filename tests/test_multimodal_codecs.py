"""Real-codec tests: stdlib PNG decode/encode/resize and WAV decode,
plus the Spark mapInPandas plumbing running them end-to-end.

The PNG filter test builds files by hand (applying the spec's filter
math in the test itself), so decode correctness is checked against an
independent construction — not just a round-trip of our own encoder.
"""

from __future__ import annotations

import io
import struct
import wave
import zlib

import numpy as np
import pytest

from iceberg_cpp_spark.operators import codecs


def _manual_png(pixels: np.ndarray, filter_type: int) -> bytes:
    """Build a PNG applying `filter_type` to every scanline, per spec."""
    h, w, c = pixels.shape
    color = {1: 0, 2: 4, 3: 2, 4: 6}[c]
    bpp = c
    lines = bytearray()
    prev = np.zeros(w * c, dtype=np.int32)
    for y in range(h):
        cur = pixels[y].reshape(-1).astype(np.int32)
        filt = np.zeros(w * c, dtype=np.int32)
        for x in range(w * c):
            left = int(cur[x - bpp]) if x >= bpp else 0
            up = int(prev[x])
            ul = int(prev[x - bpp]) if x >= bpp else 0
            if filter_type == 0:
                filt[x] = cur[x]
            elif filter_type == 1:
                filt[x] = cur[x] - left
            elif filter_type == 2:
                filt[x] = cur[x] - up
            elif filter_type == 3:
                filt[x] = cur[x] - ((left + up) >> 1)
            elif filter_type == 4:
                p = left + up - ul
                pa, pb, pc_ = abs(p - left), abs(p - up), abs(p - ul)
                pred = left if (pa <= pb and pa <= pc_) else (up if pb <= pc_ else ul)
                filt[x] = cur[x] - pred
        lines.append(filter_type)
        lines.extend((filt & 0xFF).astype(np.uint8).tobytes())
        prev = cur
    ihdr = struct.pack(">IIBBBBB", w, h, 8, color, 0, 0, 0)

    def chunk(t, d):
        return struct.pack(">I", len(d)) + t + d + struct.pack(
            ">I", zlib.crc32(t + d) & 0xFFFFFFFF)

    return (codecs.PNG_SIGNATURE + chunk(b"IHDR", ihdr)
            + chunk(b"IDAT", zlib.compress(bytes(lines)))
            + chunk(b"IEND", b""))


def _wav_bytes(rate=8000, channels=1, n=800) -> tuple[bytes, np.ndarray]:
    t = np.arange(n * channels)
    samples = (np.sin(t * 0.05) * 10000).astype("<i2")
    buf = io.BytesIO()
    with wave.open(buf, "wb") as f:
        f.setnchannels(channels)
        f.setsampwidth(2)
        f.setframerate(rate)
        f.writeframes(samples.tobytes())
    return buf.getvalue(), samples


class TestPngCodec:
    @pytest.mark.parametrize("channels", [1, 2, 3, 4])
    def test_roundtrip(self, channels):
        rng = np.random.default_rng(7)
        px = rng.integers(0, 256, (13, 9, channels), dtype=np.uint8)
        d = codecs.decode_png(codecs.encode_png(px))
        assert (d["width"], d["height"], d["channels"]) == (9, 13, channels)
        assert np.array_equal(d["pixels"], px)

    @pytest.mark.parametrize("ftype", [0, 1, 2, 3, 4])
    def test_all_filter_types(self, ftype):
        rng = np.random.default_rng(ftype + 1)
        px = rng.integers(0, 256, (8, 11, 3), dtype=np.uint8)
        d = codecs.decode_png(_manual_png(px, ftype))
        assert np.array_equal(d["pixels"], px), f"filter {ftype}"

    def test_grayscale_roundtrip_2d_input(self):
        px = np.arange(64, dtype=np.uint8).reshape(8, 8)
        d = codecs.decode_png(codecs.encode_png(px))
        assert d["channels"] == 1
        assert np.array_equal(d["pixels"][:, :, 0], px)

    def test_rejects_non_png(self):
        with pytest.raises(ValueError):
            codecs.decode_png(b"\xff\xd8\xff\xe0 jpeg-ish")

    def test_resize_nearest(self):
        px = np.array([[[0], [10]], [[20], [30]]], dtype=np.uint8)
        up = codecs.resize_nearest(px, 4, 4)
        assert up.shape == (4, 4, 1)
        assert up[0, 0, 0] == 0 and up[3, 3, 0] == 30
        down = codecs.resize_nearest(up, 2, 2)
        assert np.array_equal(down, px)

    def test_sniffers(self):
        png = codecs.encode_png(np.zeros((2, 2, 3), np.uint8))
        wav, _ = _wav_bytes()
        assert codecs.is_png(png) and not codecs.is_wav(png)
        assert codecs.is_wav(wav) and not codecs.is_png(wav)


class TestWavCodec:
    def test_decode(self):
        payload, samples = _wav_bytes(rate=8000, channels=2, n=400)
        d = codecs.decode_wav(payload)
        assert d["sample_rate"] == 8000
        assert d["channels"] == 2
        assert d["n_frames"] == 400
        assert d["duration_ms"] == 50
        assert np.array_equal(d["samples"], samples)


def _interlace_adam7(img: np.ndarray) -> bytes:
    """Independent Adam7 interlacer for the round-trip oracle: splits
    the image into the seven passes, filters each pass's rows (None on
    even rows, Up on odd rows — exercising that filter context resets
    per pass), deflates, and wraps in PNG chunks with interlace=1."""
    import struct
    import zlib

    from iceberg_cpp_spark.operators.codecs import ADAM7, _chunk

    h, w, c = img.shape
    color = {1: 0, 2: 4, 3: 2, 4: 6}[c]
    ihdr = struct.pack(">IIBBBBB", w, h, 8, color, 0, 0, 1)
    raw = bytearray()
    for x0, y0, dx, dy in ADAM7:
        sub = img[y0::dy, x0::dx]
        if sub.shape[0] == 0 or sub.shape[1] == 0:
            continue
        flat = sub.reshape(sub.shape[0], -1)
        for y in range(flat.shape[0]):
            if y % 2 == 0:
                raw.append(0)
                raw.extend(flat[y].tobytes())
            else:  # Up filter: cur - prev mod 256
                raw.append(2)
                raw.extend(((flat[y].astype(np.int16)
                             - flat[y - 1].astype(np.int16)) % 256)
                           .astype(np.uint8).tobytes())
    return (b"\x89PNG\r\n\x1a\n" + _chunk(b"IHDR", ihdr)
            + _chunk(b"IDAT", zlib.compress(bytes(raw)))
            + _chunk(b"IEND", b""))


class TestAdam7:
    @pytest.mark.parametrize("shape", [(1, 1, 1), (7, 5, 1), (8, 8, 3),
                                       (13, 9, 3), (16, 17, 4), (3, 23, 2)])
    def test_interlaced_roundtrip(self, shape):
        """Adam7 decode reproduces the original pixels exactly for
        every channel count and odd/even/sub-8 dimensions (some passes
        empty), with per-pass Up filtering in the stream."""
        rng = np.random.default_rng(sum(shape))
        img = rng.integers(0, 256, shape, dtype=np.uint8)
        d = codecs.decode_png(_interlace_adam7(img))
        assert d["channels"] == shape[2]
        assert np.array_equal(d["pixels"], img)

    def test_truncated_interlaced_fails_cleanly(self):
        img = np.arange(8 * 8 * 3, dtype=np.uint8).reshape(8, 8, 3)
        data = _interlace_adam7(img)
        with pytest.raises(ValueError):
            codecs.decode_png(data[:60])


def _palette_png(idx: np.ndarray, pal: np.ndarray, depth: int,
                 trns: bytes = None, interlace: int = 0) -> bytes:
    """Independent palette-PNG builder (filter-0 rows, MSB-first bit
    packing per spec) for the decode oracle."""
    import struct
    import zlib

    from iceberg_cpp_spark.operators.codecs import ADAM7, _chunk

    h, w = idx.shape

    def pack_rows(sub: np.ndarray) -> bytes:
        out = bytearray()
        for y in range(sub.shape[0]):
            out.append(0)
            if depth == 8:
                out.extend(sub[y].astype(np.uint8).tobytes())
            else:
                bits = ((sub[y][:, None]
                         >> np.arange(depth - 1, -1, -1)) & 1)
                flat = bits.reshape(-1).astype(np.uint8)
                pad = (-len(flat)) % 8
                flat = np.concatenate([flat, np.zeros(pad, np.uint8)])
                out.extend(np.packbits(flat).tobytes())
        return bytes(out)

    raw = bytearray()
    if interlace:
        for x0, y0, dx, dy in ADAM7:
            sub = idx[y0::dy, x0::dx]
            if sub.size:
                raw.extend(pack_rows(sub))
    else:
        raw.extend(pack_rows(idx))
    ihdr = struct.pack(">IIBBBBB", w, h, depth, 3, 0, 0, interlace)
    out = b"\x89PNG\r\n\x1a\n" + _chunk(b"IHDR", ihdr)
    out += _chunk(b"PLTE", pal.astype(np.uint8).tobytes())
    if trns is not None:
        out += _chunk(b"tRNS", trns)
    return out + _chunk(b"IDAT", zlib.compress(bytes(raw))) \
        + _chunk(b"IEND", b"")


class TestPalettePng:
    @pytest.mark.parametrize("depth,w,h", [(8, 13, 7), (4, 11, 5),
                                           (2, 9, 6), (1, 17, 3)])
    def test_palette_roundtrip(self, depth, w, h):
        rng = np.random.default_rng(depth)
        n = 1 << depth
        pal = rng.integers(0, 256, (n, 3), dtype=np.uint8)
        idx = rng.integers(0, n, (h, w), dtype=np.uint8)
        d = codecs.decode_png(_palette_png(idx, pal, depth))
        assert d["channels"] == 3
        assert np.array_equal(d["pixels"], pal[idx])

    def test_palette_trns_gives_rgba(self):
        pal = np.array([[255, 0, 0], [0, 255, 0], [0, 0, 255]], np.uint8)
        idx = np.array([[0, 1, 2], [2, 1, 0]], np.uint8)
        d = codecs.decode_png(_palette_png(idx, pal, 8, trns=bytes([0, 128])))
        assert d["channels"] == 4
        expect_a = np.array([[0, 128, 255], [255, 128, 0]], np.uint8)
        assert np.array_equal(d["pixels"][:, :, 3], expect_a)
        assert np.array_equal(d["pixels"][:, :, :3], pal[idx])

    def test_palette_interlaced(self):
        rng = np.random.default_rng(9)
        pal = rng.integers(0, 256, (16, 3), dtype=np.uint8)
        idx = rng.integers(0, 16, (12, 10), dtype=np.uint8)
        d = codecs.decode_png(_palette_png(idx, pal, 4, interlace=1))
        assert np.array_equal(d["pixels"], pal[idx])

    def test_palette_index_out_of_range(self):
        pal = np.array([[1, 2, 3]], np.uint8)  # 1 entry
        idx = np.array([[0, 5]], np.uint8)     # 5 is invalid
        with pytest.raises(ValueError, match="palette index"):
            codecs.decode_png(_palette_png(idx, pal, 8))

    def test_png_16bit_reduces_to_high_byte(self):
        import struct
        import zlib

        from iceberg_cpp_spark.operators.codecs import _chunk

        # 2x2 RGB, 16-bit big-endian samples; expect the high bytes
        hi = np.array([[[10, 20, 30], [40, 50, 60]],
                       [[70, 80, 90], [100, 110, 120]]], np.uint8)
        raw = bytearray()
        for y in range(2):
            raw.append(0)
            for x in range(2):
                for c in range(3):
                    raw += bytes([hi[y, x, c], 0xAB])  # low byte ignored
        ihdr = struct.pack(">IIBBBBB", 2, 2, 16, 2, 0, 0, 0)
        png = (b"\x89PNG\r\n\x1a\n" + _chunk(b"IHDR", ihdr)
               + _chunk(b"IDAT", zlib.compress(bytes(raw)))
               + _chunk(b"IEND", b""))
        d = codecs.decode_png(png)
        assert d["channels"] == 3
        assert np.array_equal(d["pixels"], hi)

    def test_png_16bit_grayscale(self):
        """ADVICE r08: color type 0 at depth 16 is a valid spec
        combination — flows through the same high-byte reduction as
        16-bit RGB/RGBA instead of raising."""
        import struct
        import zlib

        from iceberg_cpp_spark.operators.codecs import _chunk

        hi = np.array([[5, 250], [77, 128]], np.uint8)
        raw = bytearray()
        for y in range(2):
            raw.append(0)
            for x in range(2):
                raw += bytes([hi[y, x], 0xCD])  # low byte dropped
        ihdr = struct.pack(">IIBBBBB", 2, 2, 16, 0, 0, 0, 0)
        png = (b"\x89PNG\r\n\x1a\n" + _chunk(b"IHDR", ihdr)
               + _chunk(b"IDAT", zlib.compress(bytes(raw)))
               + _chunk(b"IEND", b""))
        d = codecs.decode_png(png)
        assert d["channels"] == 1
        assert np.array_equal(d["pixels"][:, :, 0], hi)

    def test_wav_24bit(self):
        import io
        import wave

        vals = np.array([0, 1, -1, 8388607, -8388608, 123456, -654321],
                        np.int32)
        frames = b"".join(int(v).to_bytes(3, "little", signed=True)
                          for v in vals)
        buf = io.BytesIO()
        with wave.open(buf, "wb") as f:
            f.setnchannels(1)
            f.setsampwidth(3)
            f.setframerate(8000)
            f.writeframes(frames)
        d = codecs.decode_wav(buf.getvalue())
        assert d["samples"].tolist() == vals.tolist()

    def test_gray_subbyte_scales_to_8bit(self):
        # depth-2 gray: values 0..3 scale to 0,85,170,255
        import struct
        import zlib

        from iceberg_cpp_spark.operators.codecs import _chunk

        vals = np.array([[0, 1, 2, 3, 3]], np.uint8)
        bits = ((vals[0][:, None] >> np.arange(1, -1, -1)) & 1).reshape(-1)
        flat = np.concatenate([bits, np.zeros((-len(bits)) % 8, np.uint8)])
        raw = b"\x00" + np.packbits(flat.astype(np.uint8)).tobytes()
        ihdr = struct.pack(">IIBBBBB", 5, 1, 2, 0, 0, 0, 0)
        png = (b"\x89PNG\r\n\x1a\n" + _chunk(b"IHDR", ihdr)
               + _chunk(b"IDAT", zlib.compress(raw)) + _chunk(b"IEND", b""))
        d = codecs.decode_png(png)
        assert d["pixels"][0, :, 0].tolist() == [0, 85, 170, 255, 255]


def _gif_bytes(idx: np.ndarray, pal: np.ndarray, interlace: bool = False,
               transparent: int = None) -> bytes:
    """Independent GIF89a builder for the decode oracle: 'uncompressed'
    LZW (a CLEAR before every literal keeps the dictionary empty and
    the code size constant), LSB-first bit packing, 255-byte
    sub-blocks, optional interlace row order and GCE transparency."""
    import struct

    h, w = idx.shape
    size_bits = max((len(pal) - 1).bit_length(), 1)
    n_entries = 1 << size_bits
    min_code = max(2, size_bits)
    clear, end = 1 << min_code, (1 << min_code) + 1
    cs = min_code + 1

    rows = idx
    if interlace:
        order = [y for off, step in [(0, 8), (4, 8), (2, 4), (1, 2)]
                 for y in range(off, h, step)]
        rows = idx[order]
    acc = nbits = 0
    data = bytearray()
    codes = []
    for v in rows.reshape(-1):
        codes += [clear, int(v)]
    codes.append(end)
    for c in codes:
        acc |= c << nbits
        nbits += cs
        while nbits >= 8:
            data.append(acc & 0xFF)
            acc >>= 8
            nbits -= 8
    if nbits:
        data.append(acc & 0xFF)

    out = bytearray(b"GIF89a")
    out += struct.pack("<HHBBB", w, h, 0x80 | (size_bits - 1), 0, 0)
    padded = np.zeros((n_entries, 3), np.uint8)
    padded[:len(pal)] = pal
    out += padded.tobytes()
    if transparent is not None:
        out += bytes([0x21, 0xF9, 4, 0x01, 0, 0, transparent, 0])
    out += struct.pack("<BHHHHB", 0x2C, 0, 0, w, h,
                       0x40 if interlace else 0)
    out += bytes([min_code])
    for i in range(0, len(data), 255):
        chunk = data[i:i + 255]
        out += bytes([len(chunk)]) + chunk
    out += bytes([0, 0x3B])
    return bytes(out)


class TestGif:
    def test_roundtrip(self):
        rng = np.random.default_rng(3)
        pal = rng.integers(0, 256, (16, 3), dtype=np.uint8)
        idx = rng.integers(0, 16, (9, 13), dtype=np.uint8)
        d = codecs.decode_gif(_gif_bytes(idx, pal))
        assert (d["width"], d["height"], d["channels"]) == (13, 9, 3)
        assert np.array_equal(d["pixels"], pal[idx])

    def test_interlaced_roundtrip(self):
        rng = np.random.default_rng(5)
        pal = rng.integers(0, 256, (8, 3), dtype=np.uint8)
        idx = rng.integers(0, 8, (17, 6), dtype=np.uint8)
        d = codecs.decode_gif(_gif_bytes(idx, pal, interlace=True))
        assert np.array_equal(d["pixels"], pal[idx])

    def test_transparency_gives_rgba(self):
        pal = np.array([[10, 20, 30], [40, 50, 60]], np.uint8)
        idx = np.array([[0, 1], [1, 0]], np.uint8)
        d = codecs.decode_gif(_gif_bytes(idx, pal, transparent=1))
        assert d["channels"] == 4
        assert np.array_equal(
            d["pixels"][:, :, 3],
            np.array([[255, 0], [0, 255]], np.uint8))

    def test_real_giflib_fixture(self):
        """A real giflib-produced GIF (CPython test-suite asset) with
        genuine LZW dictionary growth, code-size bumps, and GCE
        transparency decodes to pinned output — interop with the
        canonical encoder, beyond the clear-per-literal test streams."""
        import hashlib
        import os

        path = os.path.join(os.path.dirname(__file__), "..",
                            "assets", "gif", "python_giflib.gif")
        d = codecs.decode_gif(open(path, "rb").read())
        px = d["pixels"]
        assert (d["width"], d["height"], d["channels"]) == (16, 16, 4)
        assert hashlib.sha256(px.tobytes()).hexdigest().startswith(
            "65556043c031")
        assert px[8, 8].tolist() == [255, 226, 85, 255]
        assert int((px[:, :, 3] == 0).sum()) == 107  # transparent border

    def test_corrupt_gif_fails_cleanly(self):
        pal = np.array([[1, 2, 3]], np.uint8)
        idx = np.zeros((4, 4), np.uint8)
        good = _gif_bytes(idx, pal)
        for cut in (5, 10, 14, len(good) - 3):
            try:
                codecs.decode_gif(good[:cut])
            except (ValueError, NotImplementedError):
                pass
        with pytest.raises(ValueError, match="GIF"):
            codecs.decode_gif(b"GIF89a" + b"\x00" * 4)

    def test_decode_images_dispatches_gif(self, spark):
        pal = np.array([[9, 9, 9], [200, 100, 50]], np.uint8)
        idx = np.array([[0, 1, 1, 0]], np.uint8)
        df = spark.createDataFrame([(1, _gif_bytes(idx, pal))],
                                   "media_id long, payload binary")
        from iceberg_cpp_spark.operators.multimodal import (
            decode_images, with_media_metadata)

        r = decode_images(df).collect()[0]
        assert (r["width"], r["height"]) == (4, 1)
        m = with_media_metadata(df).collect()[0]
        assert m["sniffed_mime"] == "image/gif"


class TestGifFrames:
    """decode_gif_frames disposal/compositing semantics, pinned by
    HAND-DERIVED goldens (GIF89a §23 worked out on paper — not by
    running the decoder) over the checked-in fixture
    assets/gif/animated_disposal.gif (provenance: FIXTURES.md §G,
    generator: scripts/make_gif_fixtures.py)."""

    RED = [255, 0, 0, 255]
    GREEN = [0, 255, 0, 255]
    BLUE = [0, 0, 255, 255]
    CLEAR = [0, 0, 0, 0]

    @staticmethod
    def _fixture() -> dict:
        import os

        path = os.path.join(os.path.dirname(__file__), "..",
                            "assets", "gif", "animated_disposal.gif")
        return codecs.decode_gif_frames(open(path, "rb").read())

    def test_fixture_shape_and_delays(self):
        d = self._fixture()
        assert (d["width"], d["height"], d["frame_count"]) == (8, 8, 4)
        assert d["delays_ms"] == [100, 200, 300, 0]
        assert all(f.shape == (8, 8, 4) and f.dtype == np.uint8
                   for f in d["frames"])

    def test_frame0_full_screen(self):
        # full-screen solid red, disposal 1: composited canvas is red
        f0 = self._fixture()["frames"][0]
        assert (f0 == self.RED).all()

    def test_frame1_local_palette_subrect(self):
        # 4x4 green (LOCAL color table) at (2,2) over the kept red
        # canvas: inside the rect green, outside red
        f1 = self._fixture()["frames"][1]
        assert f1[2, 2].tolist() == self.GREEN
        assert f1[5, 5].tolist() == self.GREEN
        assert f1[0, 0].tolist() == self.RED
        assert f1[1, 2].tolist() == self.RED  # row above the rect
        assert f1[6, 2].tolist() == self.RED  # row below the rect
        assert (f1 == self.GREEN).all(axis=2).sum() == 16

    def test_frame2_disposal3_restored_previous(self):
        # frame 1 had disposal 3 (restore-to-previous): its green rect
        # must NOT leak into frame 2 — canvas under frame 2 is the
        # post-frame-0 all-red screen, with frame 2's blue 4x4 at (0,0)
        f2 = self._fixture()["frames"][2]
        assert f2[0, 0].tolist() == self.BLUE
        assert f2[3, 3].tolist() == self.BLUE
        assert f2[3, 3 + 1].tolist() == self.RED
        assert f2[5, 5].tolist() == self.RED  # center of frame 1's rect
        assert (f2 == self.GREEN).all(axis=2).sum() == 0
        assert (f2 == self.BLUE).all(axis=2).sum() == 16

    def test_frame3_disposal2_cleared_and_transparency(self):
        # frame 2 had disposal 2 (restore-to-background): its 4x4 rect
        # at (0,0) is cleared to transparent black before frame 3, whose
        # checkerboard draws red where (x+y) even and leaves the canvas
        # visible through its GCE-transparent index elsewhere
        f3 = self._fixture()["frames"][3]
        yy, xx = np.mgrid[0:8, 0:8]
        drawn = (xx + yy) % 2 == 0
        assert (f3[drawn] == self.RED).all()
        shown = ~drawn
        in_cleared = shown & (xx < 4) & (yy < 4)
        assert (f3[in_cleared] == self.CLEAR).all()
        assert (f3[shown & ~(( xx < 4) & (yy < 4))] == self.RED).all()

    def test_max_frames_cap(self):
        pal = np.array([[0, 0, 0], [255, 0, 0]], np.uint8)
        many = [{"grid": np.full((4, 4), i % 2), "disposal": 1}
                for i in range(10)]
        b = codecs.encode_gif(many, 4, 4, pal)
        d = codecs.decode_gif_frames(b, max_frames=5)
        assert d["frame_count"] == 5
        assert codecs.decode_gif_frames(b)["frame_count"] == 10

    def test_single_frame_file_matches_decode_gif(self):
        import os

        path = os.path.join(os.path.dirname(__file__), "..",
                            "assets", "gif", "python_giflib.gif")
        payload = open(path, "rb").read()
        d = codecs.decode_gif_frames(payload)
        single = codecs.decode_gif(payload)
        assert d["frame_count"] == 1
        # the giflib fixture's frame covers the whole logical screen,
        # so the composited canvas equals the first-frame decode
        assert np.array_equal(d["frames"][0], single["pixels"])

    def test_lzw_dictionary_growth_roundtrip(self):
        # 64x64 random 256-color frames force real dictionary growth,
        # code-size bumps, and >255-byte sub-block splitting through
        # encode_gif -> decode_gif_frames
        rng = np.random.default_rng(7)
        pal = np.stack([np.arange(256)] * 3, 1).astype(np.uint8)
        frames = [{"grid": rng.integers(0, 256, (64, 64)), "disposal": 1}
                  for _ in range(3)]
        d = codecs.decode_gif_frames(codecs.encode_gif(frames, 64, 64, pal))
        assert d["frame_count"] == 3
        for i in range(3):
            assert np.array_equal(
                d["frames"][i][:, :, 0],
                frames[i]["grid"].astype(np.uint8))

    def test_gif_frames_operator_distributed(self, spark):
        """gif_frames: the distributed frame-extraction operator — one
        row per composited frame, cumulative delay timeline, PNG
        re-encode round-trip, and typed skip-mode errors."""
        import os

        from iceberg_cpp_spark.operators.multimodal import gif_frames

        path = os.path.join(os.path.dirname(__file__), "..",
                            "assets", "gif", "animated_disposal.gif")
        good = open(path, "rb").read()
        df = spark.createDataFrame(
            [(1, good), (2, b"GIF89a garbage")],
            "media_id long, payload binary")
        rows = gif_frames(df, emit_png=True, on_error="skip").collect()
        by_id: dict = {}
        for r in rows:
            by_id.setdefault(r["media_id"], []).append(r)
        frames = sorted(by_id[1], key=lambda r: r["frame_idx"])
        assert len(frames) == 4
        assert [r["ts_ms"] for r in frames] == [0, 100, 300, 600]
        assert all((r["width"], r["height"]) == (8, 8) for r in frames)
        # frame 0 is solid red: luma = .299*255
        assert abs(frames[0]["mean_luma"] - 0.299 * 255) < 1e-6
        # PNG re-encode round-trips to the composited canvas
        d = codecs.decode_png(bytes(frames[2]["frame_png"]))
        assert d["pixels"][0, 0].tolist() == self.BLUE
        assert d["pixels"][5, 5].tolist() == self.RED
        # corrupt payload: one typed error row, stage survives
        bad = by_id[2]
        assert len(bad) == 1 and bad[0]["frame_idx"] is None
        assert "ValueError" in bad[0]["decode_error"]
        # raise mode propagates
        with pytest.raises(Exception):
            gif_frames(df).collect()

    def test_fixture_bytes_pinned(self):
        # regeneration must be byte-stable (scripts/make_gif_fixtures.py)
        import hashlib
        import os

        path = os.path.join(os.path.dirname(__file__), "..",
                            "assets", "gif", "animated_disposal.gif")
        h = hashlib.sha256(open(path, "rb").read()).hexdigest()
        assert h.startswith("f6fb80a3a11adb53")


class TestErrorContract:
    """Corrupt/truncated payloads raise ValueError or
    NotImplementedError — never raw zlib/struct/wave errors — which is
    what decode_images/decode_audio skip modes classify on."""

    def test_png_wav_fuzz_fail_cleanly(self):
        import io
        import random
        import wave

        rng = random.Random(7)
        png = codecs.encode_png(
            np.arange(16 * 16 * 3, dtype=np.uint8).reshape(16, 16, 3))
        buf = io.BytesIO()
        with wave.open(buf, "wb") as f:
            f.setnchannels(1)
            f.setsampwidth(2)
            f.setframerate(8000)
            f.writeframes(np.arange(800, dtype="<i2").tobytes())
        wav = buf.getvalue()
        for trial in range(600):
            k = trial % 4
            if k == 0:
                data = png[:rng.randrange(1, len(png))]
            elif k == 1:
                i = rng.randrange(8, len(png))
                data = (png[:i] + bytes([png[i] ^ (1 << rng.randrange(8))])
                        + png[i + 1:])
            elif k == 2:
                data = wav[:rng.randrange(1, len(wav))]
            else:
                i = rng.randrange(4, len(wav))
                data = (wav[:i] + bytes([wav[i] ^ (1 << rng.randrange(8))])
                        + wav[i + 1:])
            try:
                (codecs.decode_png if k < 2 else codecs.decode_wav)(data)
            except (ValueError, NotImplementedError):
                pass  # lucky decodes are also fine

    def test_gif_frames_fuzz_fail_cleanly(self):
        """Truncations and bit flips of a real animated GIF never escape
        the ValueError/NotImplementedError contract of
        decode_gif_frames (the corpus skip mode classifies on it)."""
        import os
        import random

        rng = random.Random(11)
        path = os.path.join(os.path.dirname(__file__), "..",
                            "assets", "gif", "animated_disposal.gif")
        good = open(path, "rb").read()
        for trial in range(400):
            if trial % 2 == 0:
                data = good[:rng.randrange(1, len(good))]
            else:
                i = rng.randrange(6, len(good))
                data = (good[:i] + bytes([good[i] ^ (1 << rng.randrange(8))])
                        + good[i + 1:])
            try:
                d = codecs.decode_gif_frames(data)
                assert d["frame_count"] >= 1  # lucky decode is fine
            except (ValueError, NotImplementedError):
                pass


class TestSparkPlumbing:
    def test_decode_images_real(self, spark):
        rng = np.random.default_rng(3)
        rows = [(i, codecs.encode_png(
            rng.integers(0, 256, (4 + i, 6 + i, 3), dtype=np.uint8)))
            for i in range(4)]
        df = spark.createDataFrame(rows, "media_id long, payload binary")
        from iceberg_cpp_spark.operators.multimodal import decode_images

        got = {r["media_id"]: r for r in decode_images(df).collect()}
        for i in range(4):
            assert got[i]["width"] == 6 + i
            assert got[i]["height"] == 4 + i
            assert len(got[i]["features"]) == 3

    def test_resize_images_real(self, spark):
        px = np.arange(4 * 6 * 3, dtype=np.uint8).reshape(4, 6, 3)
        df = spark.createDataFrame([(1, codecs.encode_png(px))],
                                   "media_id long, payload binary")
        from iceberg_cpp_spark.operators.multimodal import resize_images

        out = resize_images(df, width=3, height=2).collect()[0]
        d = codecs.decode_png(bytes(out["resized"]))
        assert (d["width"], d["height"]) == (3, 2)
        assert np.array_equal(d["pixels"], codecs.resize_nearest(px, 3, 2))

    def test_decode_audio_real(self, spark):
        payload, _ = _wav_bytes(rate=16000, channels=1, n=1600)
        df = spark.createDataFrame([(7, payload)],
                                   "media_id long, payload binary")
        from iceberg_cpp_spark.operators.multimodal import decode_audio

        r = decode_audio(df).collect()[0]
        assert r["sample_rate"] == 16000
        assert r["duration_ms"] == 100
        assert len(r["features"]) == 3

    def test_decode_images_non_png_raises(self, spark):
        df = spark.createDataFrame([(1, b"not an image")],
                                   "media_id long, payload binary")
        from iceberg_cpp_spark.operators.multimodal import decode_images

        with pytest.raises(Exception, match="PNG|NotImplemented"):
            decode_images(df).collect()

    def test_decode_images_on_error_skip(self, spark):
        """Web-corpus mode: undecodable payloads keep their row with a
        decode_error instead of failing the stage — good rows in the
        same batch still decode."""
        good = codecs.encode_png(np.arange(4 * 6 * 3, dtype=np.uint8)
                                 .reshape(4, 6, 3))
        corrupt_png = good[:40] + b"\x00" * 8  # valid magic, broken body
        df = spark.createDataFrame(
            [(1, good), (2, b"BM bitmap not supported"), (3, corrupt_png)],
            "media_id long, payload binary")
        from iceberg_cpp_spark.operators.multimodal import decode_images

        got = {r["media_id"]: r for r in
               decode_images(df, on_error="skip").collect()}
        assert got[1]["width"] == 6 and got[1]["decode_error"] is None
        assert got[2]["width"] is None and "NotImplementedError" in got[2]["decode_error"]
        assert got[3]["width"] is None and got[3]["decode_error"]
        # strict default keeps the old schema and fail-fast behavior
        assert "decode_error" not in decode_images(df).columns
        with pytest.raises(ValueError, match="on_error"):
            decode_images(df, on_error="ignore")

    def test_decode_audio_on_error_skip(self, spark):
        payload, _ = _wav_bytes(rate=16000, channels=1, n=160)
        df = spark.createDataFrame(
            [(1, payload), (2, b"RIFFjunkWAVEbroken"), (3, payload[:20])],
            "media_id long, payload binary")
        from iceberg_cpp_spark.operators.multimodal import decode_audio

        got = {r["media_id"]: r for r in
               decode_audio(df, on_error="skip").collect()}
        assert got[1]["sample_rate"] == 16000
        assert got[1]["decode_error"] is None
        assert got[2]["sample_rate"] is None and got[2]["decode_error"]
        assert got[3]["sample_rate"] is None and got[3]["decode_error"]
        # strict default unchanged
        assert "decode_error" not in decode_audio(df).columns

    def test_resize_images_on_error_skip(self, spark):
        good = codecs.encode_png(np.arange(4 * 6 * 3, dtype=np.uint8)
                                 .reshape(4, 6, 3))
        df = spark.createDataFrame(
            [(1, good), (2, b"BM not supported")],
            "media_id long, payload binary")
        from iceberg_cpp_spark.operators.multimodal import resize_images

        got = {r["media_id"]: r for r in
               resize_images(df, 3, 2, on_error="skip").collect()}
        d = codecs.decode_png(bytes(got[1]["resized"]))
        assert (d["width"], d["height"]) == (3, 2)
        assert got[1]["resize_error"] is None
        assert got[2]["resized"] is None
        assert "NotImplementedError" in got[2]["resize_error"]

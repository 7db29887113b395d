"""Baseline JPEG codec tests (ADVICE r07: the 507-line codec had no
coverage despite being wired into decode_images/resize_images).

- round-trips: gray/RGB, 4:4:4/4:2:0, odd dimensions, quality extremes
- a checked-in libjpeg-produced fixture (CPython test suite's
  ``python.jpg``, baseline 4:2:0 16x16) decoded to pinned pixel values
- progressive / CMYK / truncated inputs fail with the right errors
"""

import hashlib
import os
import struct

import numpy as np
import pytest

from iceberg_cpp_spark.operators.jpeg import decode_jpeg, encode_jpeg, is_jpeg

FIXTURE = os.path.join(os.path.dirname(__file__), "..",
                       "assets", "jpeg", "python_libjpeg_baseline.jpg")


def _gradient(h, w):
    yy, xx = np.mgrid[0:h, 0:w]
    return np.stack([yy * 255 // max(h - 1, 1),
                     xx * 255 // max(w - 1, 1),
                     (yy + xx) * 255 // max(h + w - 2, 1)],
                    axis=2).astype(np.uint8)


class TestRoundTrip:
    @pytest.mark.parametrize("quality,sub,tol_max,tol_mean", [
        (95, "444", 4, 1.0),
        (95, "420", 10, 2.5),
        (95, "422", 10, 2.5),
        (100, "444", 2, 0.5),
        (100, "420", 8, 2.0),
        (60, "444", 12, 3.0),
    ])
    def test_rgb_gradient(self, quality, sub, tol_max, tol_mean):
        img = _gradient(45, 37)  # odd dims: exercises edge padding
        enc = encode_jpeg(img, quality=quality, subsampling=sub)
        assert is_jpeg(enc)
        d = decode_jpeg(enc)
        assert (d["height"], d["width"], d["channels"]) == (45, 37, 3)
        err = np.abs(d["pixels"].astype(int) - img.astype(int))
        assert err.max() <= tol_max and err.mean() <= tol_mean

    def test_gray_roundtrip(self):
        yy, xx = np.mgrid[0:33, 0:41]
        gray = ((yy * 3 + xx * 2) % 256).astype(np.uint8)
        d = decode_jpeg(encode_jpeg(gray, quality=92))
        assert (d["height"], d["width"], d["channels"]) == (33, 41, 1)
        err = np.abs(d["pixels"][:, :, 0].astype(int) - gray.astype(int))
        assert err.mean() <= 3.0

    def test_quality_floor_still_decodes(self):
        img = _gradient(24, 24)
        d = decode_jpeg(encode_jpeg(img, quality=1))
        assert d["pixels"].shape == (24, 24, 3)
        # heavily quantized but still correlated with the source
        err = np.abs(d["pixels"].astype(int) - img.astype(int))
        assert err.mean() < 40

    def test_single_pixel_and_exact_mcu(self):
        one = np.full((1, 1, 3), 200, np.uint8)
        assert decode_jpeg(encode_jpeg(one))["pixels"].shape == (1, 1, 3)
        block = _gradient(16, 16)
        d = decode_jpeg(encode_jpeg(block, subsampling="420"))
        assert d["pixels"].shape == (16, 16, 3)


class TestLibjpegFixture:
    """The committed fixture was produced by libjpeg (CPython test-suite
    asset) — decoding it proves interop with the canonical encoder:
    4:2:0 sampling, real optimized Huffman tables, JFIF headers."""

    def test_pinned_decode(self):
        d = decode_jpeg(open(FIXTURE, "rb").read())
        px = d["pixels"]
        assert (d["width"], d["height"], d["channels"]) == (16, 16, 3)
        assert hashlib.sha256(px.tobytes()).hexdigest().startswith(
            "2a250932a73d8418")
        assert px[0, 0].tolist() == [0, 2, 7]
        assert px[8, 8].tolist() == [250, 235, 74]
        assert px[15, 15].tolist() == [0, 1, 6]

    def test_fixture_is_420(self):
        # guards against swapping the fixture for a trivial 4:4:4 file
        data = open(FIXTURE, "rb").read()
        i = 2
        while True:
            assert data[i] == 0xFF
            m = data[i + 1]
            (ln,) = struct.unpack_from(">H", data, i + 2)
            if m == 0xC0:
                seg = data[i + 4:i + 2 + ln]
                assert (seg[7] >> 4, seg[7] & 15) == (2, 2)  # luma h,v
                break
            i += 2 + ln


def _seg(marker: bytes, body: bytes) -> bytes:
    return marker + struct.pack(">H", 2 + len(body)) + body


class TestProgressive:
    """SOF2 decode (VERDICT r07 task 6) — a hand-assembled stream with a
    known coefficient oracle, plus a real libjpeg progressive fixture."""

    def test_handcrafted_scans_exact(self):
        """Grayscale 8x8, qt=identity, coefficients pinned by hand:
        DC=41 (odd → exercises the DC refinement bit), zigzag k=1 → 5
        (AC-first + correction), k=5 → 1 (appears ONLY in the AC
        refinement scan as a newly-nonzero ±1), k=10 → -3 (negative,
        first + correction). Four scans: DC first (Al=1), AC first
        (Al=1), DC refine, AC refine — every §G.1.2 decode path."""
        import numpy as np

        from iceberg_cpp_spark.operators.jpeg import _A, _ZZ_FLAT

        data = b"\xff\xd8"
        data += _seg(b"\xff\xdb", bytes([0]) + bytes([1] * 64))  # DQT: 1s
        data += _seg(b"\xff\xc2",
                     struct.pack(">BHHB", 8, 8, 8, 1) + bytes([1, 0x11, 0]))
        # DC table 0: one symbol (size-cat 5), code '0'
        data += _seg(b"\xff\xc4", bytes([0x00, 1] + [0] * 15 + [5]))
        # AC table 0 (first scan): 0x02, 0x81, EOB as 2-bit codes
        data += _seg(b"\xff\xc4",
                     bytes([0x10, 0, 3] + [0] * 14 + [0x02, 0x81, 0x00]))
        # AC table 1 (refinement scan): 0x31, EOB as 2-bit codes
        data += _seg(b"\xff\xc4",
                     bytes([0x11, 0, 2] + [0] * 14 + [0x31, 0x00]))
        # scan 1 — DC first, Al=1: code '0' + receive(5)=20 → pad
        data += _seg(b"\xff\xda", bytes([1, 1, 0x00, 0, 0, 0x01])) + b"\x53"
        # scan 2 — AC first, Al=1: (0,2)+'10', (8,1)+'0', EOB
        data += _seg(b"\xff\xda", bytes([1, 1, 0x00, 1, 63, 0x01])) + b"\x25\x7f"
        # scan 3 — DC refine: one bit (41 & 1 = 1); 0xFF needs stuffing
        data += _seg(b"\xff\xda", bytes([1, 1, 0x00, 0, 0, 0x10])) + b"\xff\x00"
        # scan 4 — AC refine, Al=0: (3,1)+sign 1, corr k1=1, EOB, corr k10=1
        data += _seg(b"\xff\xda", bytes([1, 1, 0x01, 1, 63, 0x10])) + b"\x37"
        data += b"\xff\xd9"

        d = decode_jpeg(data)
        assert (d["width"], d["height"], d["channels"]) == (8, 8, 1)
        coef = np.zeros(64)
        coef[_ZZ_FLAT[0]] = 41
        coef[_ZZ_FLAT[1]] = 5
        coef[_ZZ_FLAT[5]] = 1
        coef[_ZZ_FLAT[10]] = -3
        expected = np.clip(
            np.round(_A.T @ coef.reshape(8, 8) @ _A + 128.0),
            0, 255).astype(np.uint8)
        assert np.array_equal(d["pixels"][:, :, 0], expected)

    def test_restart_intervals_reset_pred_and_eobrun(self):
        """Progressive DRI path: restart markers must reset BOTH the DC
        predictor and the AC EOB run. Two-block grayscale 16x8, DRI=1:
        block B's DC diff is encoded against a RESET predictor, and
        block A ends with an EOB run that (invalidly) claims more blocks
        — the restart must clear it or block B's AC scan is skipped."""
        import numpy as np

        from iceberg_cpp_spark.operators.jpeg import _A, _ZZ_FLAT

        data = b"\xff\xd8"
        data += _seg(b"\xff\xdb", bytes([0]) + bytes([1] * 64))
        data += _seg(b"\xff\xc2",
                     struct.pack(">BHHB", 8, 8, 16, 1) + bytes([1, 0x11, 0]))
        data += _seg(b"\xff\xdd", struct.pack(">H", 1))  # DRI = 1 MCU
        # DC table: size-cat 3 -> '00', size-cat 4 -> '01'
        data += _seg(b"\xff\xc4", bytes([0x00, 0, 2] + [0] * 14 + [3, 4]))
        # AC table: 0x02,0x20,0x13,EOB as 3-bit codes '000'..'011'
        data += _seg(b"\xff\xc4",
                     bytes([0x10, 0, 0, 4] + [0] * 13
                           + [0x02, 0x20, 0x13, 0x00]))
        # scan 1 — DC first Al=0: A: '01'+1010(=10); RST0; B: '00'+001(=-6)
        data += _seg(b"\xff\xda", bytes([1, 1, 0x00, 0, 0, 0x00]))
        data += b"\x6b\xff\xd0\x0f"
        # scan 2 — AC first: A: (0,2)+'11'(=3 at k1), EOBRUN r=2+bits 00
        # (claims 3 more blocks); RST0 resets it; B: (1,3)+'011'(=-4 at
        # k2), EOB
        data += _seg(b"\xff\xda", bytes([1, 1, 0x00, 1, 63, 0x00]))
        data += b"\x19\x3f\xff\xd0\x4d\xff\x00"
        data += b"\xff\xd9"

        d = decode_jpeg(data)
        assert (d["width"], d["height"], d["channels"]) == (16, 8, 1)

        def px(dc, k, v):
            coef = np.zeros(64)
            coef[_ZZ_FLAT[0]] = dc
            coef[_ZZ_FLAT[k]] = v
            return np.clip(np.round(_A.T @ coef.reshape(8, 8) @ _A + 128.0),
                           0, 255).astype(np.uint8)

        assert np.array_equal(d["pixels"][:, :8, 0], px(10, 1, 3))
        assert np.array_equal(d["pixels"][:, 8:, 0], px(-6, 2, -4))

    def test_real_libjpeg_progressive_fixture(self):
        """A real libjpeg-produced progressive file (Rust embedded-book
        asset, SOF2, 3 components, 10 scans incl. refinements) decodes
        to pinned output — guards the full multi-scan/multi-component
        path against regressions."""
        d = decode_jpeg(open(os.path.join(
            os.path.dirname(FIXTURE), "progressive_libjpeg.jpg"),
            "rb").read())
        px = d["pixels"]
        assert (d["width"], d["height"], d["channels"]) == (720, 477, 3)
        assert hashlib.sha256(px.tobytes()).hexdigest().startswith(
            "12889f7e9ddd1821")
        assert px[0, 0].tolist() == [236, 240, 235]
        assert px[238, 360].tolist() == [80, 81, 79]
        assert 100 < px.mean() < 115  # not washed out / inverted


class TestErrors:
    def test_arithmetic_coding_raises(self):
        sof9 = struct.pack(">BHHB", 8, 8, 8, 1) + bytes([1, 0x11, 0])
        data = (b"\xff\xd8" + b"\xff\xc9"
                + struct.pack(">H", 2 + len(sof9)) + sof9)
        with pytest.raises(NotImplementedError, match="SOF9"):
            decode_jpeg(data)

    def test_cmyk_raises(self):
        sof0 = struct.pack(">BHHB", 8, 8, 8, 4)
        for c in range(4):
            sof0 += bytes([c + 1, 0x11, 0])
        data = (b"\xff\xd8" + b"\xff\xc0"
                + struct.pack(">H", 2 + len(sof0)) + sof0)
        with pytest.raises(NotImplementedError, match="4 components"):
            decode_jpeg(data)

    def test_eoi_before_sos_fails_cleanly(self):
        with pytest.raises(ValueError, match="missing SOS"):
            decode_jpeg(b"\xff\xd8\xff\xd9")

    def test_dimension_bomb_rejected(self):
        """A hostile header claiming 65000x65000 must fail fast instead
        of grinding the pure-python scan loop for minutes (corpus-scale
        decompression-bomb guard; PNG has the same cap)."""
        from iceberg_cpp_spark.operators import codecs

        sof = struct.pack(">BHHB", 8, 65000, 65000, 1) + bytes([1, 0x11, 0])
        data = (b"\xff\xd8" + b"\xff\xc0"
                + struct.pack(">H", 2 + len(sof)) + sof)
        with pytest.raises(ValueError, match="sanity"):
            decode_jpeg(data)
        # PNG: forge an IHDR with huge dims
        ihdr = struct.pack(">IIBBBBB", 65000, 65000, 8, 2, 0, 0, 0)
        png = (b"\x89PNG\r\n\x1a\n" + struct.pack(">I", len(ihdr))
               + b"IHDR" + ihdr + b"\x00\x00\x00\x00")
        with pytest.raises(ValueError, match="sanity"):
            codecs.decode_png(png)
        # the cap is caller-adjustable
        with pytest.raises(ValueError, match="missing SOS"):
            decode_jpeg(data, max_pixels=65000 * 65000)

    def test_not_a_jpeg(self):
        with pytest.raises(ValueError, match="SOI"):
            decode_jpeg(b"\x89PNG....")

    def test_bad_channel_count_encode(self):
        with pytest.raises(ValueError, match="channels"):
            encode_jpeg(np.zeros((4, 4, 2), np.uint8))

    def test_undefined_huffman_table_and_sos_before_sof(self):
        """ADVICE r08: streams whose SOS references a Huffman table that
        was never defined, or that carry SOS before any SOF, surfaced as
        raw TypeError (None unpacked / None dimensions) — the boundary
        wrapper must normalize them to ValueError like every other
        corrupt-stream family."""
        sof = struct.pack(">BHHB", 8, 8, 8, 1) + bytes([1, 0x11, 0])
        sos = struct.pack(">B", 1) + bytes([1, 0x57]) + bytes([0, 63, 0])
        undefined_huff = (b"\xff\xd8"
                          + b"\xff\xc0" + struct.pack(">H", 2 + len(sof)) + sof
                          + b"\xff\xda" + struct.pack(">H", 2 + len(sos)) + sos
                          + b"\x00" * 16 + b"\xff\xd9")
        with pytest.raises(ValueError):
            decode_jpeg(undefined_huff)
        sos_first = (b"\xff\xd8"
                     + b"\xff\xda" + struct.pack(">H", 2 + len(sos)) + sos
                     + b"\x00" * 16 + b"\xff\xd9")
        with pytest.raises(ValueError):
            decode_jpeg(sos_first)

    def test_corrupt_inputs_fail_cleanly(self):
        """decode_images(on_error='skip') relies on the decode error
        contract: corrupt/truncated payloads raise ValueError or
        NotImplementedError — never IndexError/KeyError/struct.error —
        and never hang. Deterministic fuzz over the failure families
        the boundary wrapper normalizes."""
        import random

        rng = random.Random(42)
        img = np.arange(48 * 48, dtype=np.uint8).reshape(48, 48)
        enc = encode_jpeg(img, quality=85)
        prog = open(os.path.join(os.path.dirname(FIXTURE),
                                 "progressive_libjpeg.jpg"), "rb").read()[:4000]
        for trial in range(500):
            kind = trial % 5
            if kind == 0:  # random bytes behind a valid SOI
                data = b"\xff\xd8" + bytes(
                    rng.randrange(256) for _ in range(rng.randrange(200)))
            elif kind == 1:  # truncation
                data = enc[:rng.randrange(1, len(enc))]
            elif kind == 2:  # single flipped bit
                i = rng.randrange(2, len(enc))
                data = (enc[:i] + bytes([enc[i] ^ (1 << rng.randrange(8))])
                        + enc[i + 1:])
            elif kind == 3:  # truncated progressive
                data = prog[:rng.randrange(4, len(prog))]
            else:  # marker soup
                data = b"\xff\xd8" + b"".join(
                    bytes([0xFF, rng.randrange(0x01, 0xFF), 0,
                           rng.randrange(10)])
                    for _ in range(rng.randrange(20)))
            try:
                d = decode_jpeg(data)
                assert d["pixels"].dtype == np.uint8  # lucky decode is fine
            except (ValueError, NotImplementedError):
                pass


class TestCmykCorpusMode:
    """VERDICT r09 task 2: the checked-in complete CMYK fixture
    (assets/jpeg/cmyk_adobe_app14.jpg — full Adobe APP14 + 4-component
    SOF0 + real entropy data, generator scripts/make_cmyk_fixture.py)
    flows through the corpus skip mode as one TYPED error row with zero
    stage failures; the unit refusal pin (TestErrors::test_cmyk_raises)
    stays as the header-level check."""

    @staticmethod
    def _fixture_bytes() -> bytes:
        path = os.path.join(os.path.dirname(__file__), "..",
                            "assets", "jpeg", "cmyk_adobe_app14.jpg")
        return open(path, "rb").read()

    def test_fixture_is_complete_adobe_jpeg(self):
        p = self._fixture_bytes()
        assert is_jpeg(p) and p.endswith(b"\xff\xd9")
        assert b"Adobe" in p[:40]          # APP14 marker present
        i = p.find(b"\xff\xc0")            # SOF0: 4 components
        assert i > 0 and p[i + 9] == 4
        with pytest.raises(NotImplementedError, match="4 components"):
            decode_jpeg(p)

    def test_skip_mode_yields_typed_error_row(self, spark):
        from iceberg_cpp_spark.operators.multimodal import decode_images

        good = encode_jpeg(np.full((16, 16), 128, np.uint8))
        df = spark.createDataFrame(
            [(1, self._fixture_bytes()), (2, good)],
            "media_id long, payload binary")
        rows = {r["media_id"]: r
                for r in decode_images(df, on_error="skip").collect()}
        assert rows[2]["decode_error"] is None
        assert (rows[2]["width"], rows[2]["height"]) == (16, 16)
        err = rows[1]["decode_error"]
        assert err is not None and "NotImplementedError" in err
        assert "4 components" in err
        assert rows[1]["width"] is None

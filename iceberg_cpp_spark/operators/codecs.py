"""Real, dependency-free media codecs for the multimodal operators.

No PIL/opencv/ffmpeg exist in this environment, but two formats are
fully decodable with the stdlib alone and that is enough to make the
multimodal pipeline real end-to-end for at least one image and one
audio format:

- PNG: chunk walk + zlib inflate + scanline unfilter (all five PNG
  filter types); 8-bit gray / gray+alpha / RGB / RGBA, PLTE palette
  (bit depths 1/2/4/8, tRNS transparency -> RGBA), sub-byte grayscale
  (1/2/4-bit scaled to 8), non-interlaced AND Adam7 interlaced (seven
  independently filtered sub-images scattered onto the pixel grid).
  16-bit samples reduce to their high byte per the spec's 8-bit
  recommendation. Also a minimal encoder (filter-0 scanlines) so
  resize can round-trip.
- WAV: RIFF/PCM 8/16/24/32-bit via the stdlib ``wave`` module.

Everything returns numpy arrays; the Spark-side callers keep these
inside Arrow-batched ``mapInPandas`` so the decode runs vectorized per
executor batch, never per-row-in-Python-udf.
"""

from __future__ import annotations

import io
import struct
import wave
import zlib

import numpy as np

# baseline JPEG lives in its own module (operators/jpeg.py); re-exported
# here so callers have one codec namespace
from iceberg_cpp_spark.operators.jpeg import (  # noqa: F401
    decode_jpeg, encode_jpeg, is_jpeg)

PNG_SIGNATURE = b"\x89PNG\r\n\x1a\n"

_CHANNELS = {0: 1, 2: 3, 4: 2, 6: 4}  # PNG color type -> samples/pixel


def is_png(payload: bytes) -> bool:
    return payload[:8] == PNG_SIGNATURE


def is_wav(payload: bytes) -> bool:
    return payload[:4] == b"RIFF" and payload[8:12] == b"WAVE"


def is_gif(payload: bytes) -> bool:
    return payload[:6] in (b"GIF87a", b"GIF89a")


def _paeth(a: int, b: int, c: int) -> int:
    p = a + b - c
    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
    if pa <= pb and pa <= pc:
        return a
    return b if pb <= pc else c


def _unfilter(raw: bytes, stride: int, height: int, bpp: int) -> np.ndarray:
    """Undo PNG scanline filtering → (height, stride) uint8.  ``bpp`` is
    the filter delta distance in BYTES (1 for packed sub-byte depths)."""
    out = np.zeros((height, stride), dtype=np.uint8)
    pos = 0
    for y in range(height):
        ftype = raw[pos]
        pos += 1
        line = np.frombuffer(raw, np.uint8, stride, pos).copy()
        pos += stride
        prev = out[y - 1] if y else np.zeros(stride, np.uint8)
        if ftype == 0:  # None
            cur = line
        elif ftype == 2:  # Up — vectorized (no intra-row dependence)
            cur = line + prev  # uint8 wraps mod 256, per spec
        elif ftype == 1:
            # Sub — vectorized (r18, guide §1.2 per-task work): the
            # recurrence out[x] = (line[x] + out[x-bpp]) % 256 is an
            # independent running sum per residue class mod bpp, so
            # each class is one cumsum (int64, exact) masked to a byte
            cur = np.empty(stride, np.uint8)
            for r0 in range(min(bpp, stride)):
                cur[r0::bpp] = (line[r0::bpp].astype(np.int64).cumsum()
                                & 0xFF).astype(np.uint8)
        else:  # Average/Paeth carry along x: sequential per byte
            cur = np.zeros(stride, np.uint8)
            li, pi = line.tolist(), prev.tolist()
            cl = cur.tolist()
            for x in range(stride):
                left = cl[x - bpp] if x >= bpp else 0
                up = pi[x]
                ul = pi[x - bpp] if x >= bpp else 0
                if ftype == 1:
                    v = li[x] + left
                elif ftype == 3:
                    v = li[x] + ((left + up) >> 1)
                elif ftype == 4:
                    v = li[x] + _paeth(left, up, ul)
                else:
                    raise ValueError(f"bad PNG filter type {ftype}")
                cl[x] = v & 0xFF
            cur = np.asarray(cl, dtype=np.uint8)
        out[y] = cur
    return out


def decode_png(payload: bytes, max_pixels: int = 64_000_000) -> dict:
    """Full PNG decode → {width, height, channels, pixels(h,w,c) uint8}.

    Error contract (same as decode_jpeg): undecodable payloads raise
    ValueError (corrupt/truncated/non-PNG) or NotImplementedError
    (valid but unsupported variant) — never a raw zlib/struct error —
    so decode_images(on_error='skip') can classify failures.
    ``max_pixels`` rejects decompression-bomb headers before allocating."""
    try:
        return _decode_png(payload, max_pixels)
    except (ValueError, NotImplementedError):
        raise
    except (zlib.error, struct.error, IndexError) as e:
        raise ValueError(f"corrupt PNG ({type(e).__name__}: {e})") from e


def _unpack_samples(rows: np.ndarray, depth: int, width_samples: int) -> np.ndarray:
    """(h, stride_bytes) packed rows → (h, width_samples) values for
    sub-byte depths (MSB-first per PNG spec); identity at depth 8."""
    if depth == 8:
        return rows[:, :width_samples]
    bits = np.unpackbits(rows, axis=1)
    groups = bits[:, :(bits.shape[1] // depth) * depth] \
        .reshape(rows.shape[0], -1, depth)
    weights = (1 << np.arange(depth - 1, -1, -1)).astype(np.uint8)
    return groups.dot(weights)[:, :width_samples].astype(np.uint8)


def _decode_png(payload: bytes, max_pixels: int) -> dict:
    if not is_png(payload):
        raise ValueError("not a PNG (bad signature)")
    pos = 8
    width = height = None
    depth = color = 0
    adam7 = False
    plte = None
    trns = None
    idat = bytearray()
    while pos + 8 <= len(payload):
        (ln,) = struct.unpack_from(">I", payload, pos)
        ctype = payload[pos + 4:pos + 8]
        data = payload[pos + 8:pos + 8 + ln]
        pos += 12 + ln  # length + type + data + crc
        if ctype == b"IHDR":
            width, height, depth, color, _comp, _filt, interlace = \
                struct.unpack(">IIBBBBB", data)
            if color == 3:  # palette: packed indices, PLTE required
                if depth not in (1, 2, 4, 8):
                    raise ValueError(f"palette PNG bit depth {depth}")
            elif color == 0:  # grayscale: sub-byte depths AND 16-bit
                if depth not in (1, 2, 4, 8, 16):
                    raise ValueError(
                        f"PNG bit depth {depth} for color type 0")
            elif color in _CHANNELS:
                if depth not in (8, 16):
                    raise ValueError(
                        f"PNG bit depth {depth} for color type {color}")
            else:
                raise ValueError(f"PNG color type {color}")
            if interlace not in (0, 1):
                raise ValueError(f"PNG interlace method {interlace}")
            if width * height > max_pixels or width == 0 or height == 0:
                raise ValueError(
                    f"PNG dimensions {width}x{height} outside sanity "
                    f"bounds (max_pixels={max_pixels})")
            adam7 = bool(interlace)
        elif ctype == b"PLTE":
            plte = np.frombuffer(data, np.uint8)[:(len(data) // 3) * 3] \
                .reshape(-1, 3)
        elif ctype == b"tRNS" and color == 3:
            trns = np.frombuffer(data, np.uint8)
        elif ctype == b"IDAT":
            idat.extend(data)
        elif ctype == b"IEND":
            break
    if width is None:
        raise ValueError("PNG missing IHDR")
    if color == 3 and plte is None:
        raise ValueError("palette PNG missing PLTE")
    spp = 1 if color in (0, 3) else _CHANNELS[color]  # samples/pixel

    if color == 3:
        alpha = trns is not None
        out_ch = 4 if alpha else 3
        pal = plte
        if alpha:
            a = np.full(len(plte), 255, np.uint8)
            a[:len(trns)] = trns[:len(pal)]
            pal = np.concatenate([plte, a[:, None]], axis=1)

    def to_pixels(rows: np.ndarray, w: int) -> np.ndarray:
        """Unfiltered rows for a (sub-)image of width w → (h,w,C)."""
        if color == 3:
            idx = _unpack_samples(rows, depth, w)
            if idx.max(initial=0) >= len(pal):
                raise ValueError("palette index out of range")
            return pal[idx]
        if color == 0 and depth < 8:
            v = _unpack_samples(rows, depth, w).astype(np.uint16)
            return ((v * 255) // ((1 << depth) - 1)) \
                .astype(np.uint8)[:, :, None]
        if depth == 16:
            # 16-bit samples are big-endian; the spec-sanctioned 8-bit
            # reduction keeps the high byte
            return rows[:, :w * spp * 2] \
                .reshape(rows.shape[0], w, spp, 2)[..., 0]
        return rows[:, :w * spp].reshape(rows.shape[0], w, spp)

    def stride_of(w: int) -> int:
        return (w * spp * depth + 7) // 8

    bpp = max(1, spp * depth // 8)  # filter delta distance in bytes
    raw = zlib.decompress(bytes(idat))
    if adam7:
        pixels = None
        pos2 = 0
        for x0, y0, dx, dy in ADAM7:
            pw = (width - x0 + dx - 1) // dx
            ph = (height - y0 + dy - 1) // dy
            if pw <= 0 or ph <= 0:
                continue
            st = stride_of(pw)
            nbytes = ph * (1 + st)
            sub = to_pixels(
                _unfilter(raw[pos2:pos2 + nbytes], st, ph, bpp), pw)
            if pixels is None:
                pixels = np.zeros((height, width, sub.shape[2]), np.uint8)
            pixels[y0::dy, x0::dx] = sub
            pos2 += nbytes
        if pos2 != len(raw):
            raise ValueError(
                f"interlaced PNG data length {len(raw)} != {pos2}")
    else:
        st = stride_of(width)
        expected = height * (1 + st)
        if len(raw) != expected:
            raise ValueError(f"PNG data length {len(raw)} != {expected}")
        pixels = to_pixels(_unfilter(raw, st, height, bpp), width)
    return {"width": width, "height": height,
            "channels": pixels.shape[2], "pixels": pixels}


# Adam7 pass layout (PNG spec §8.2): (x0, y0, dx, dy) per pass
ADAM7 = [(0, 0, 8, 8), (4, 0, 8, 8), (0, 4, 4, 8), (2, 0, 4, 4),
         (0, 2, 2, 4), (1, 0, 2, 2), (0, 1, 1, 2)]


def _chunk(ctype: bytes, data: bytes) -> bytes:
    crc = zlib.crc32(ctype + data) & 0xFFFFFFFF
    return struct.pack(">I", len(data)) + ctype + data + struct.pack(">I", crc)


def encode_png(pixels: np.ndarray) -> bytes:
    """Minimal PNG encoder: 8-bit, filter-0 scanlines, one IDAT."""
    arr = np.asarray(pixels, dtype=np.uint8)
    if arr.ndim == 2:
        arr = arr[:, :, None]
    h, w, c = arr.shape
    color = {1: 0, 2: 4, 3: 2, 4: 6}[c]
    ihdr = struct.pack(">IIBBBBB", w, h, 8, color, 0, 0, 0)
    # prepend the filter-0 byte per scanline
    body = np.zeros((h, 1 + w * c), dtype=np.uint8)
    body[:, 1:] = arr.reshape(h, w * c)
    return (PNG_SIGNATURE + _chunk(b"IHDR", ihdr)
            + _chunk(b"IDAT", zlib.compress(body.tobytes(), 6))
            + _chunk(b"IEND", b""))


def resize_nearest(pixels: np.ndarray, width: int, height: int) -> np.ndarray:
    """Nearest-neighbor resample (h,w,c) → (height,width,c)."""
    h, w = pixels.shape[:2]
    ys = np.minimum((np.arange(height) * h) // height, h - 1)
    xs = np.minimum((np.arange(width) * w) // width, w - 1)
    return pixels[ys][:, xs]


# per-min_code_size LZW base tables, shared across calls: the literal
# entries are never mutated (growth always allocates `prev + [x]`), so
# a shallow copy replaces rebuilding 2^n singleton lists / tuple keys
# per frame and per CLEAR code — measured hot in animated-GIF decode
_LZW_DEC_BASE: dict[int, list] = {}
_LZW_ENC_BASE: dict[int, dict] = {}


def _lzw_dec_table(clear: int) -> list:
    base = _LZW_DEC_BASE.get(clear)
    if base is None:
        base = [[i] for i in range(clear)] + [None, None]
        _LZW_DEC_BASE[clear] = base
    return list(base)


def _lzw_enc_table(clear: int) -> dict:
    base = _LZW_ENC_BASE.get(clear)
    if base is None:
        base = {(i,): i for i in range(clear)}
        _LZW_ENC_BASE[clear] = base
    return dict(base)


def _lzw_decode(min_code_size: int, data: bytes, max_out: int) -> list:
    """GIF-variant LZW (LSB-first code packing, CLEAR/END codes,
    dictionary capped at 4096). ``max_out`` bounds output (bomb guard).
    Returns a list of palette indices."""
    clear = 1 << min_code_size
    end = clear + 1
    code_size = min_code_size + 1
    table: list = _lzw_dec_table(clear)
    out: list = []
    prev = None
    acc = 0
    nbits = 0
    pos = 0
    while True:
        while nbits < code_size:
            if pos >= len(data):
                return out  # truncated stream: return what decoded
            acc |= data[pos] << nbits
            nbits += 8
            pos += 1
        code = acc & ((1 << code_size) - 1)
        acc >>= code_size
        nbits -= code_size
        if code == clear:
            table = _lzw_dec_table(clear)
            code_size = min_code_size + 1
            prev = None
            continue
        if code == end:
            return out
        if code < len(table) and table[code] is not None:
            entry = table[code]
        elif code == len(table) and prev is not None:
            entry = prev + [prev[0]]  # the KwK case
        else:
            raise ValueError(f"bad LZW code {code}")
        out.extend(entry)
        if len(out) > max_out:
            raise ValueError("LZW output exceeds image size")
        if prev is not None and len(table) < 4096:
            table.append(prev + [entry[0]])
            if len(table) == (1 << code_size) and code_size < 12:
                code_size += 1
        prev = entry


# GIF interlace passes: (row offset, row step)
_GIF_PASSES = [(0, 8), (4, 8), (2, 4), (1, 2)]


def decode_gif(payload: bytes, max_pixels: int = 64_000_000) -> dict:
    """First-frame GIF87a/89a decode → {width, height, channels,
    pixels}: LZW decompression, global/local color tables, interlacing,
    GCE transparency (→ RGBA). Animated GIFs yield their FIRST frame —
    the right summary unit for image-corpus features (use
    ``decode_gif_frames`` for the full animation). Same error contract
    as the other decoders."""
    try:
        return _decode_gif(payload, max_pixels)
    except (ValueError, NotImplementedError):
        raise
    except (IndexError, struct.error, ZeroDivisionError) as e:
        raise ValueError(f"corrupt GIF ({type(e).__name__}: {e})") from e


def decode_gif_frames(payload: bytes, max_pixels: int = 64_000_000,
                      max_frames: int = 256) -> dict:
    """Animated GIF decode → {width, height (logical screen),
    frame_count, frames: [(h,w,4) RGBA], delays_ms: [int]}: frames are
    COMPOSITED onto the logical screen per GIF89a disposal semantics —
    0/1 keep, 2 restore-to-background (frame rect cleared), 3
    restore-to-previous. ``max_frames`` bounds memory against
    frame-bomb files (frames past the cap are not decoded). Same error
    contract as decode_gif."""
    try:
        return _decode_gif_frames(payload, max_pixels, max_frames)
    except (ValueError, NotImplementedError):
        raise
    except (IndexError, struct.error, ZeroDivisionError) as e:
        raise ValueError(f"corrupt GIF ({type(e).__name__}: {e})") from e


def _iter_gif_blocks(payload: bytes, max_pixels: int):
    """Parse a GIF container: yields one dict per image block
    {left, top, w, h, grid(h,w uint16), ct, transparent, disposal,
    delay_cs}, de-interlaced, with the preceding GCE's state applied
    and reset after each frame (GIF89a §23)."""
    sw, sh, packed, _bg, _ar = struct.unpack_from("<HHBBB", payload, 6)
    if sw * sh > max_pixels:
        raise ValueError(
            f"GIF screen {sw}x{sh} outside sanity bounds "
            f"(max_pixels={max_pixels})")
    pos = 13
    gct = None
    if packed & 0x80:
        n = 2 << (packed & 7)
        gct = np.frombuffer(payload, np.uint8, 3 * n, pos).reshape(-1, 3)
        pos += 3 * n
    transparent = None
    disposal = 0
    delay_cs = 0
    while pos < len(payload):
        b = payload[pos]
        pos += 1
        if b == 0x3B:  # trailer
            break
        if b == 0x21:  # extension
            label = payload[pos]
            pos += 1
            if label == 0xF9 and payload[pos] >= 4:  # GCE
                flags = payload[pos + 1]
                disposal = (flags >> 2) & 0x7
                (delay_cs,) = struct.unpack_from("<H", payload, pos + 2)
                if flags & 1:
                    transparent = payload[pos + 4]
            while payload[pos]:  # skip sub-blocks
                pos += 1 + payload[pos]
            pos += 1
            continue
        if b != 0x2C:  # image descriptor
            raise ValueError(f"unexpected GIF block 0x{b:02x}")
        left, top, w, h, ipacked = struct.unpack_from("<HHHHB", payload, pos)
        pos += 9
        if w == 0 or h == 0 or w * h > max_pixels:
            raise ValueError(
                f"GIF dimensions {w}x{h} outside sanity bounds "
                f"(max_pixels={max_pixels})")
        ct = gct
        if ipacked & 0x80:
            n = 2 << (ipacked & 7)
            ct = np.frombuffer(payload, np.uint8, 3 * n, pos).reshape(-1, 3)
            pos += 3 * n
        if ct is None:
            raise ValueError("GIF image without a color table")
        min_code = payload[pos]
        pos += 1
        if not 2 <= min_code <= 11:
            raise ValueError(f"bad GIF LZW min code size {min_code}")
        data = bytearray()
        while payload[pos]:
            ln = payload[pos]
            data.extend(payload[pos + 1:pos + 1 + ln])
            pos += 1 + ln
        pos += 1
        idx = _lzw_decode(min_code, bytes(data), w * h)
        idx += [0] * (w * h - len(idx))  # truncated stream: pad
        grid = np.asarray(idx[:w * h], np.uint16).reshape(h, w)
        if ipacked & 0x40:  # interlaced row order
            de = np.zeros_like(grid)
            src = 0
            for off, step in _GIF_PASSES:
                rows = range(off, h, step)
                de[list(rows)] = grid[src:src + len(rows)]
                src += len(rows)
            grid = de
        if grid.max(initial=0) >= len(ct):
            raise ValueError("GIF color index out of range")
        yield {"screen": (sw, sh), "left": left, "top": top, "w": w,
               "h": h, "grid": grid, "ct": ct, "transparent": transparent,
               "disposal": disposal, "delay_cs": delay_cs}
        transparent, disposal, delay_cs = None, 0, 0  # GCE scope: 1 frame


def _decode_gif(payload: bytes, max_pixels: int) -> dict:
    if not is_gif(payload):
        raise ValueError("not a GIF (bad signature)")
    for f in _iter_gif_blocks(payload, max_pixels):
        grid, ct = f["grid"], f["ct"]
        rgb = ct[grid]
        if f["transparent"] is not None:
            alpha = np.where(grid == f["transparent"], 0, 255) \
                .astype(np.uint8)
            px = np.concatenate([rgb, alpha[:, :, None]], axis=2)
        else:
            px = rgb
        # first frame only; frame dims (not logical screen) reported
        return {"width": f["w"], "height": f["h"], "channels": px.shape[2],
                "pixels": px}
    raise ValueError("GIF contains no image data")


def _decode_gif_frames(payload: bytes, max_pixels: int,
                       max_frames: int) -> dict:
    if not is_gif(payload):
        raise ValueError("not a GIF (bad signature)")
    canvas = None
    sw = sh = 0
    frames: list[np.ndarray] = []
    delays: list[int] = []
    for f in _iter_gif_blocks(payload, max_pixels):
        if len(frames) >= max_frames:
            break
        if canvas is None:
            sw, sh = f["screen"]
            canvas = np.zeros((sh, sw, 4), np.uint8)
        # clip the frame rect to the logical screen (corrupt files may
        # place frames out of bounds)
        left, top = f["left"], f["top"]
        w = min(f["w"], sw - left) if left < sw else 0
        h = min(f["h"], sh - top) if top < sh else 0
        prev = canvas.copy() if f["disposal"] == 3 else None
        if w > 0 and h > 0:
            grid = f["grid"][:h, :w]
            rgb = f["ct"][grid]
            if f["transparent"] is not None:
                mask = grid != f["transparent"]
            else:
                mask = np.ones((h, w), bool)
            region = canvas[top:top + h, left:left + w]
            region[mask] = np.concatenate(
                [rgb, np.full((h, w, 1), 255, np.uint8)], axis=2)[mask]
        frames.append(canvas.copy())
        delays.append(f["delay_cs"] * 10)
        if f["disposal"] == 2 and w > 0 and h > 0:
            canvas[top:top + h, left:left + w] = 0
        elif f["disposal"] == 3 and prev is not None:
            canvas = prev
    if not frames:
        raise ValueError("GIF contains no image data")
    return {"width": sw, "height": sh, "frame_count": len(frames),
            "frames": frames, "delays_ms": delays}


def _lzw_encode(min_code_size: int, indices) -> bytes:
    """GIF-variant LZW compressor (the encode direction of
    ``_lzw_decode``): greedy longest-match dictionary build, LSB-first
    code packing, code width grown when the NEXT free code crosses the
    current width (mirrors the decoder's len(table)==1<<code_size
    rule so both sides stay in sync), CLEAR emitted on a full (4096)
    table."""
    clear = 1 << min_code_size
    end = clear + 1
    code_size = min_code_size + 1
    table: dict = _lzw_enc_table(clear)
    next_code = end + 1
    buf = bytearray()
    acc = 0
    nbits = 0

    def emit(code: int) -> None:
        nonlocal acc, nbits
        acc |= code << nbits
        nbits += code_size
        while nbits >= 8:
            buf.append(acc & 0xFF)
            acc >>= 8
            nbits -= 8

    emit(clear)
    w: tuple = ()
    for k in indices:
        k = int(k)
        wk = w + (k,)
        if wk in table:
            w = wk
            continue
        emit(table[w])
        if next_code < 4096:
            table[wk] = next_code
            next_code += 1
            # grow one step AFTER the width is exceeded: the decoder
            # appends one entry behind the encoder, so it crosses
            # len(table)==1<<code_size exactly one code later
            if next_code == (1 << code_size) + 1 and code_size < 12:
                code_size += 1
        else:
            emit(clear)
            table = _lzw_enc_table(clear)
            next_code = end + 1
            code_size = min_code_size + 1
        w = (k,)
    if w:
        emit(table[w])
    emit(end)
    if nbits:
        buf.append(acc & 0xFF)
    return bytes(buf)


def encode_gif(frames: list[dict], width: int, height: int,
               palette: np.ndarray) -> bytes:
    """Animated GIF89a encoder (the write leg of the GIF codec — e.g.
    re-encoding sampled/resized animations in a media pipeline). One
    global color table; each frame dict: {grid: (h,w) palette indices,
    left, top, delay_cs, disposal, transparent (index|None),
    local_palette (optional (n,3) uint8)}. Frames may be sub-rects of
    the logical screen; compositing semantics on decode follow GIF89a
    §23 (see decode_gif_frames)."""
    pal = np.asarray(palette, np.uint8)
    if pal.ndim != 2 or pal.shape[1] != 3:
        raise ValueError("palette must be (n, 3) uint8")
    bits = max(1, (len(pal) - 1).bit_length())
    out = bytearray(b"GIF89a")
    out += struct.pack("<HHBBB", width, height,
                       0x80 | ((bits - 1) & 7), 0, 0)
    out += pal.tobytes() + b"\x00\x00\x00" * ((2 << (bits - 1)) - len(pal))
    # loop forever (Netscape 2.0 application extension)
    out += (b"\x21\xff\x0bNETSCAPE2.0\x03\x01\x00\x00\x00")
    for f in frames:
        grid = np.asarray(f["grid"], np.uint16)
        h, w = grid.shape
        transparent = f.get("transparent")
        flags = ((int(f.get("disposal", 0)) & 7) << 2) \
            | (1 if transparent is not None else 0)
        out += struct.pack("<BBBBHB B", 0x21, 0xF9, 4, flags,
                           int(f.get("delay_cs", 0)),
                           transparent if transparent is not None else 0, 0)
        lpal = f.get("local_palette")
        ipacked = 0
        if lpal is not None:
            lpal = np.asarray(lpal, np.uint8)
            lbits = max(1, (len(lpal) - 1).bit_length())
            ipacked = 0x80 | ((lbits - 1) & 7)
        out += struct.pack("<BHHHHB", 0x2C, int(f.get("left", 0)),
                           int(f.get("top", 0)), w, h, ipacked)
        if lpal is not None:
            out += lpal.tobytes() \
                + b"\x00\x00\x00" * ((2 << (lbits - 1)) - len(lpal))
        ncolors = len(lpal) if lpal is not None else len(pal)
        if grid.max(initial=0) >= ncolors:
            raise ValueError("GIF frame index out of palette range")
        min_code = max(2, (ncolors - 1).bit_length())
        data = _lzw_encode(min_code, grid.ravel())
        out.append(min_code)
        for i in range(0, len(data), 255):
            chunk = data[i:i + 255]
            out.append(len(chunk))
            out += chunk
        out.append(0)
    out.append(0x3B)
    return bytes(out)


def decode_wav(payload: bytes) -> dict:
    """RIFF/PCM WAV decode via the stdlib → metadata + int samples.
    Same error contract as decode_png: corrupt input → ValueError."""
    try:
        return _decode_wav(payload)
    except (ValueError, NotImplementedError):
        raise
    except (wave.Error, EOFError, RuntimeError, struct.error) as e:
        raise ValueError(f"corrupt WAV ({type(e).__name__}: {e})") from e


def _decode_wav(payload: bytes) -> dict:
    with wave.open(io.BytesIO(payload), "rb") as f:
        rate = f.getframerate()
        nch = f.getnchannels()
        nframes = f.getnframes()
        width = f.getsampwidth()
        frames = f.readframes(nframes)
    if width == 2:
        samples = np.frombuffer(frames, dtype="<i2")
    elif width == 1:
        samples = np.frombuffer(frames, dtype=np.uint8).astype(np.int16) - 128
    elif width == 3:
        # 24-bit little-endian signed: widen to int32 via an extension
        # byte that carries the sign (b2's top bit)
        b = np.frombuffer(frames, np.uint8).reshape(-1, 3).astype(np.int32)
        samples = (b[:, 0] | (b[:, 1] << 8) | (b[:, 2] << 16)
                   | (np.where(b[:, 2] & 0x80, 0xFF, 0) << 24)).astype(np.int32)
    elif width == 4:
        samples = np.frombuffer(frames, dtype="<i4")
    else:
        raise NotImplementedError(f"WAV sample width {width}")
    return {"sample_rate": rate, "channels": nch, "n_frames": nframes,
            "duration_ms": int(nframes * 1000 / rate) if rate else 0,
            "samples": samples}

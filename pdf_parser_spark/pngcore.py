"""Minimal pure-stdlib PNG codec (real decode for the multimodal path).

PNG (ISO/IEC 15948) is a chunked container around a zlib stream whose
rows carry the same five filters (None/Sub/Up/Average/Paeth) this repo
already implements for PDF stream predictors — so a real decoder is
``zlib.decompress`` + :func:`pdfcore.filters.apply_predictor` plus
chunk walking. No PIL needed.

Scope (typed ``PngError`` outside it):

- bit depth 8; color types 0 (gray), 2 (RGB), 3 (palette → RGB),
  4 (gray+alpha), 6 (RGBA); interlace 0 AND Adam7 (round 3: the seven
  sub-images de-filter independently and scatter into the full grid).
- the encoder emits valid files with a selectable per-row filter
  (0/1/2/3/4) — used by the round-trip tests to drive every filter
  branch of the shared de-filter kernel.

Cited parity target: the reference consumes images only through
browser/PIL codecs; this decoder exists so the 100 TB multimodal
pipeline has at least one REAL format end to end in-sandbox.
"""

from __future__ import annotations

import struct
import zlib
from typing import Dict, List

from .pdfcore.filters import apply_predictor

_SIG = b"\x89PNG\r\n\x1a\n"
_CHANNELS = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}


class PngError(ValueError):
    def __init__(self, code: str, msg: str):
        super().__init__(msg)
        self.code = code


def _chunk(tag: bytes, body: bytes) -> bytes:
    return (
        struct.pack(">I", len(body))
        + tag
        + body
        + struct.pack(">I", zlib.crc32(tag + body) & 0xFFFFFFFF)
    )


def encode_png(
    width: int, height: int, pixels: bytes, color_type: int = 2, filter_type: int = 0,
    interlace: bool = False,
) -> bytes:
    """8-bit PNG from raw interleaved ``pixels`` (len == w*h*channels).

    ``filter_type`` applies the SAME filter to every row (enough to
    exercise each decoder branch; a real optimizer would pick per row).
    ``interlace=True`` writes Adam7 passes (filter 0 scanlines).
    """
    ch = _CHANNELS[color_type]
    if color_type == 3:
        raise PngError("encode_palette", "palette encoding not supported")
    if len(pixels) != width * height * ch:
        raise PngError("encode_size", "pixel buffer does not match dimensions")
    if interlace:
        raw7 = _interlace_adam7(pixels, width, height, ch)
        ihdr = struct.pack(">IIBBBBB", width, height, 8, color_type, 0, 0, 1)
        return (
            _SIG
            + _chunk(b"IHDR", ihdr)
            + _chunk(b"IDAT", zlib.compress(raw7))
            + _chunk(b"IEND", b"")
        )
    # Filtering on the ENCODE side has no recurrence — predictions read
    # the original raster, so the whole image filters in one numpy pass
    # (round-5 vectorization; bytes identical to the old per-pixel loop).
    import numpy as np

    row_len = width * ch
    arr = (
        np.frombuffer(pixels, dtype=np.uint8)
        .reshape(height, row_len)
        .astype(np.int16)
    )
    if filter_type == 0:
        pred = np.zeros_like(arr)
    else:
        left = np.zeros_like(arr)
        left[:, ch:] = arr[:, :-ch]
        up = np.zeros_like(arr)
        up[1:] = arr[:-1]
        if filter_type == 1:
            pred = left
        elif filter_type == 2:
            pred = up
        elif filter_type == 3:
            pred = (left + up) >> 1
        else:  # Paeth
            corner = np.zeros_like(arr)
            corner[1:, ch:] = arr[:-1, :-ch]
            p = left + up - corner
            pa, pb, pc = np.abs(p - left), np.abs(p - up), np.abs(p - corner)
            pred = np.where(
                (pa <= pb) & (pa <= pc), left, np.where(pb <= pc, up, corner)
            )
    filtered = np.empty((height, row_len + 1), dtype=np.uint8)
    filtered[:, 0] = filter_type
    filtered[:, 1:] = (arr - pred).astype(np.uint8)  # wrap = & 0xFF
    raw = filtered.tobytes()
    ihdr = struct.pack(">IIBBBBB", width, height, 8, color_type, 0, 0, 0)
    return (
        _SIG
        + _chunk(b"IHDR", ihdr)
        + _chunk(b"IDAT", zlib.compress(bytes(raw)))
        + _chunk(b"IEND", b"")
    )


def decode_png(data: bytes) -> Dict:
    """→ {width, height, bit_depth, color_type, channels, pixels} with
    ``pixels`` de-filtered, palette-expanded to RGB when applicable."""
    if data[:8] != _SIG:
        raise PngError("not_png", "missing PNG signature")
    pos = 8
    ihdr = None
    idat: List[bytes] = []
    plte = b""
    while pos + 8 <= len(data):
        (length,) = struct.unpack(">I", data[pos : pos + 4])
        tag = data[pos + 4 : pos + 8]
        if pos + 12 + length > len(data):
            # a corrupt declared length must surface as a typed error,
            # not silently truncate the chunk and drop the rest of the file
            raise PngError("truncated", f"chunk {tag!r} overruns file")
        body = data[pos + 8 : pos + 8 + length]
        pos += 12 + length  # skip CRC (tolerated, not verified)
        if tag == b"IHDR":
            if len(body) != 13:
                raise PngError("no_ihdr", f"IHDR length {len(body)} != 13")
            ihdr = struct.unpack(">IIBBBBB", body)
        elif tag == b"PLTE":
            plte = body
        elif tag == b"IDAT":
            idat.append(body)
        elif tag == b"IEND":
            break
    if ihdr is None:
        raise PngError("no_ihdr", "missing IHDR chunk")
    w, h, bd, ct, comp, filt, interlace = ihdr
    if interlace not in (0, 1):
        raise PngError("interlaced", f"unknown interlace method {interlace}")
    if bd != 8:
        raise PngError("bit_depth", f"bit depth {bd} not supported (8 only)")
    if ct not in _CHANNELS:
        raise PngError("color_type", f"color type {ct} not supported")
    if comp != 0 or filt != 0:
        raise PngError("method", "non-standard compression/filter method")
    ch = _CHANNELS[ct]
    try:
        raw = zlib.decompress(b"".join(idat))
    except zlib.error as e:
        raise PngError("zlib", f"IDAT inflate failed: {e}") from None
    if interlace == 1:
        pixels = _deinterlace_adam7(raw, w, h, ch)
    else:
        expected = h * (w * ch + 1)
        if len(raw) < expected:
            raise PngError("truncated", "IDAT shorter than image dimensions imply")
        pixels = apply_predictor(
            raw[:expected],
            {"Predictor": 15, "Colors": ch, "BitsPerComponent": 8, "Columns": w},
        )
    if ct == 3:
        if not plte:
            raise PngError("no_plte", "palette image without PLTE chunk")
        import numpy as np

        idx = np.frombuffer(pixels, dtype=np.uint8)
        if idx.size and int(idx.max()) * 3 + 3 > len(plte):
            raise PngError("plte_range", "palette index out of range")
        pal = np.frombuffer(plte[: (len(plte) // 3) * 3], dtype=np.uint8).reshape(-1, 3)
        pixels, ch, ct = pal[idx].tobytes(), 3, 2
    return {
        "width": w,
        "height": h,
        "bit_depth": bd,
        "color_type": ct,
        "channels": ch,
        "pixels": pixels,
    }


# Adam7 pass grid: (x_start, y_start, x_step, y_step) per pass
_ADAM7 = [
    (0, 0, 8, 8), (4, 0, 8, 8), (0, 4, 4, 8), (2, 0, 4, 4),
    (0, 2, 2, 4), (1, 0, 2, 2), (0, 1, 1, 2),
]


def _deinterlace_adam7(raw: bytes, w: int, h: int, ch: int) -> bytes:
    """Seven independently-filtered sub-images → full raster. Empty
    passes (sub-image with zero width or height) contribute no bytes,
    not even filter bytes, per the PNG spec.  Pass placement is one
    strided-slice numpy assignment per pass (round-5: replaces the
    per-pixel loop — the technique already used for resize_nearest)."""
    import numpy as np

    out = np.zeros((h, w, ch), dtype=np.uint8)
    pos = 0
    for x0, y0, dx, dy in _ADAM7:
        pw = (w - x0 + dx - 1) // dx
        ph = (h - y0 + dy - 1) // dy
        if pw == 0 or ph == 0:
            continue
        need = ph * (pw * ch + 1)
        if pos + need > len(raw):
            raise PngError("truncated", "Adam7 pass data shorter than expected")
        sub = apply_predictor(
            raw[pos : pos + need],
            {"Predictor": 15, "Colors": ch, "BitsPerComponent": 8, "Columns": pw},
        )
        pos += need
        out[y0::dy, x0::dx] = np.frombuffer(sub, dtype=np.uint8).reshape(
            ph, pw, ch
        )
    return out.tobytes()


def _interlace_adam7(pixels: bytes, w: int, h: int, ch: int) -> bytes:
    """Raster → concatenated Adam7 pass scanlines with filter-0 bytes
    (encoder side, used to synthesize interlaced test fixtures)."""
    import numpy as np

    arr = np.frombuffer(pixels, dtype=np.uint8).reshape(h, w, ch)
    out = bytearray()
    for x0, y0, dx, dy in _ADAM7:
        pw = (w - x0 + dx - 1) // dx
        ph = (h - y0 + dy - 1) // dy
        if pw == 0 or ph == 0:
            continue
        rows = np.zeros((ph, pw * ch + 1), dtype=np.uint8)
        rows[:, 1:] = arr[y0::dy, x0::dx].reshape(ph, pw * ch)
        out += rows.tobytes()
    return bytes(out)


def resize_nearest(img: Dict, out_w: int, out_h: int) -> Dict:
    """Nearest-neighbor resize of a decoded image (per-channel).

    One numpy fancy-index gather — identical index math to the old
    per-pixel Python loop (floor (y*h)//out_h clamped to h-1), ~50×
    faster inside the codec mapper."""
    import numpy as np

    w, h, ch, px = img["width"], img["height"], img["channels"], img["pixels"]
    if w and h and out_w and out_h:
        arr = np.frombuffer(px, dtype=np.uint8)[: w * h * ch].reshape(h, w, ch)
        sy = np.minimum(h - 1, (np.arange(out_h) * h) // out_h)
        sx = np.minimum(w - 1, (np.arange(out_w) * w) // out_w)
        out = arr[sy][:, sx].tobytes()
    else:
        out = b""
    return {
        "width": out_w, "height": out_h, "bit_depth": 8,
        "color_type": img["color_type"], "channels": ch, "pixels": out,
    }

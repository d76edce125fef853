"""Minimal pure-stdlib GIF87a/89a codec (real decode for multimodal).

GIF is a palette container around LSB-first variable-width LZW — a
DIFFERENT LZW than the MSB-first early-change PDF flavor in
:mod:`pdfcore.filters`, so it gets its own 40-line decompressor here.

Scope (typed :class:`GifError` outside it):

- decode: 87a/89a, global/local color tables, the first image frame
  via decode_gif, and (round 4) FULL animation decode via
  decode_gif_frames — GIF89a Graphic Control semantics: transparency
  index, disposal 0/1 (leave) / 2 (restore rect to background color —
  documented convention, output has no alpha) / 3 (restore to
  previous canvas), composed RGB canvases per frame,
  interlaced row order, transparency ignored (bytes are returned as
  opaque RGB), sub-block stitching.
- encode: single-frame GIF89a with a caller palette and NON-compressed
  LZW emission (clear code before every symbol keeps the table empty —
  legal per the spec, simple, and exercises the real bit unpacker).

The reference consumes images only through browser codecs; this exists
so the multimodal pipeline covers the last common crawl image format
natively (PNG/JPEG already decode for real)."""

from __future__ import annotations

import struct
from typing import Dict, List, Tuple

__all__ = ["GifError", "decode_gif", "encode_gif", "parse_gif_header"]


class GifError(ValueError):
    def __init__(self, code: str, msg: str):
        super().__init__(msg)
        self.code = code


def _sub_blocks(data: bytes, pos: int) -> Tuple[bytes, int]:
    """Concatenate data sub-blocks starting at ``pos``; returns
    (payload, position after the 0x00 terminator)."""
    out = bytearray()
    while True:
        if pos >= len(data):
            raise GifError("truncated", "sub-block chain overruns file")
        n = data[pos]
        pos += 1
        if n == 0:
            return bytes(out), pos
        if pos + n > len(data):
            raise GifError("truncated", "sub-block overruns file")
        out += data[pos : pos + n]
        pos += n


def _lzw_decode_gif(min_code_size: int, data: bytes, max_pixels: int) -> bytes:
    """GIF LZW: LSB-first bit packing, variable code width up to 12,
    clear/EOI codes, table grows AFTER emitting (no early change)."""
    clear = 1 << min_code_size
    eoi = clear + 1
    out = bytearray()

    def reset():
        return {i: bytes([i]) for i in range(clear)}, min_code_size + 1, eoi + 1

    table, width, next_code = reset()
    acc = nacc = 0
    prev: bytes = b""
    for byte in data:
        acc |= byte << nacc
        nacc += 8
        while nacc >= width:
            code = acc & ((1 << width) - 1)
            acc >>= width
            nacc -= width
            if code == clear:
                table, width, next_code = reset()
                prev = b""
                continue
            if code == eoi:
                return bytes(out)
            if code in table:
                entry = table[code]
            elif code == next_code and prev:
                entry = prev + prev[:1]
            else:
                raise GifError("lzw", f"invalid LZW code {code}")
            out += entry
            if len(out) >= max_pixels:
                return bytes(out[:max_pixels])
            if prev:
                table[next_code] = prev + entry[:1]
                next_code += 1
                if next_code == (1 << width) and width < 12:
                    width += 1
            prev = entry
    return bytes(out)


def parse_gif_header(data: bytes) -> Dict:
    if data[:6] not in (b"GIF87a", b"GIF89a"):
        raise GifError("not_gif", "missing GIF signature")
    if len(data) < 13:
        raise GifError("truncated", "header shorter than logical screen descriptor")
    w, h = struct.unpack("<HH", data[6:10])
    return {"width": w, "height": h, "channels": 3}


# interlaced GIF row passes: (start, step)
_INTERLACE = [(0, 8), (4, 8), (2, 4), (1, 2)]


def decode_gif(data: bytes) -> Dict:
    """→ {width, height, channels=3, pixels (RGB), n_frames}: the FIRST
    frame expanded through its palette; later frames only counted."""
    hdr = parse_gif_header(data)
    w, h = hdr["width"], hdr["height"]
    packed = data[10]
    pos = 13
    gct = b""
    if packed & 0x80:
        n = 2 << (packed & 0x07)
        gct = data[pos : pos + 3 * n]
        pos += 3 * n
    pixels = None
    n_frames = 0
    while pos < len(data):
        b0 = data[pos]
        if b0 == 0x3B:  # trailer
            break
        if b0 == 0x21:  # extension: label + sub-blocks
            if pos + 2 > len(data):
                raise GifError("truncated", "extension overruns file")
            _body, pos = _sub_blocks(data, pos + 2)
            continue
        if b0 != 0x2C:
            raise GifError("corrupt", f"unexpected block 0x{b0:02X}")
        if pos + 10 > len(data):
            raise GifError("truncated", "image descriptor overruns file")
        ix, iy, iw, ih = struct.unpack("<HHHH", data[pos + 1 : pos + 9])
        ipacked = data[pos + 9]
        pos += 10
        lct = b""
        if ipacked & 0x80:
            n = 2 << (ipacked & 0x07)
            lct = data[pos : pos + 3 * n]
            pos += 3 * n
        if pos >= len(data):
            raise GifError("truncated", "missing LZW minimum code size")
        min_code = data[pos]
        if not (2 <= min_code <= 11):
            raise GifError("lzw", f"bad LZW minimum code size {min_code}")
        payload, pos = _sub_blocks(data, pos + 1)
        n_frames += 1
        if pixels is not None:
            continue  # only the first frame is decoded
        palette = lct or gct
        if not palette:
            raise GifError("no_palette", "image without global or local color table")
        idx = _lzw_decode_gif(min_code, payload, iw * ih)
        if len(idx) < iw * ih:
            raise GifError("truncated", "LZW data shorter than frame")
        # de-interlace row order if needed
        if ipacked & 0x40:
            rows = []
            for start, step in _INTERLACE:
                rows.extend(range(start, ih, step))
            ordered = bytearray(iw * ih)
            for src_row, dst_row in enumerate(rows):
                ordered[dst_row * iw : (dst_row + 1) * iw] = idx[
                    src_row * iw : (src_row + 1) * iw
                ]
            idx = bytes(ordered)
        # frame → full canvas (background 0), palette-expand to RGB
        canvas = bytearray(w * h)
        for row in range(ih):
            if iy + row >= h:
                break
            span = idx[row * iw : (row + 1) * iw][: max(0, w - ix)]
            canvas[(iy + row) * w + ix : (iy + row) * w + ix + len(span)] = span
        rgb = bytearray()
        for i in canvas:
            off = i * 3
            if off + 3 > len(palette):
                raise GifError("palette_range", "palette index out of range")
            rgb += palette[off : off + 3]
        pixels = bytes(rgb)
    if pixels is None:
        raise GifError("no_image", "no image descriptor found")
    return {"width": w, "height": h, "channels": 3, "pixels": pixels,
            "n_frames": n_frames}


def encode_gif(width: int, height: int, indices: bytes, palette: bytes,
               interlace: bool = False) -> bytes:
    """Single-frame GIF89a from palette ``indices`` (one byte each) and
    an RGB ``palette`` (len = 3·2^n). Uncompressed-style LZW: a clear
    code before every pixel keeps the dictionary empty — valid output
    that fully exercises the decoder's bit unpacker and reset path."""
    if len(indices) != width * height:
        raise GifError("encode_size", "index buffer does not match dimensions")
    n_colors = len(palette) // 3
    if n_colors < 2 or n_colors > 256 or (n_colors & (n_colors - 1)):
        raise GifError("encode_palette", "palette size must be a power of two in 2..256")
    depth = max(2, n_colors.bit_length() - 1)  # min LZW code size >= 2
    out = bytearray(b"GIF89a")
    out += struct.pack("<HHBBB", width, height, 0x80 | (depth - 1), 0, 0)
    pal = palette + b"\x00" * (3 * ((1 << depth) - n_colors))
    out += pal
    ipacked = 0x40 if interlace else 0
    out += b"\x2c" + struct.pack("<HHHH", 0, 0, width, height) + bytes([ipacked])
    src = indices
    if interlace:
        rows = []
        for start, step in _INTERLACE:
            rows.extend(range(start, height, step))
        src = b"".join(indices[r * width : (r + 1) * width] for r in rows)
    clear = 1 << depth
    eoi = clear + 1
    width_bits = depth + 1
    acc = nacc = 0
    payload = bytearray()

    def put(code):
        nonlocal acc, nacc
        acc |= code << nacc
        nacc += width_bits
        while nacc >= 8:
            payload.append(acc & 0xFF)
            acc >>= 8
            nacc -= 8

    for i in src:
        put(clear)  # keep the table permanently empty
        put(i)
    put(eoi)
    if nacc:
        payload.append(acc & 0xFF)
    out += bytes([depth])
    for i in range(0, len(payload), 255):
        chunk = payload[i : i + 255]
        out += bytes([len(chunk)]) + chunk
    out += b"\x00\x3b"
    return bytes(out)


# ----------------------------------------------------------------------
# animated GIF (round 4): full GIF89a frame decode with GCE semantics
# ----------------------------------------------------------------------
def _lzw_clear_style(indices: bytes, depth: int) -> bytes:
    """Clear-before-every-pixel LZW payload (same scheme encode_gif
    uses): valid, dictionary-free output."""
    clear = 1 << depth
    eoi = clear + 1
    width_bits = depth + 1
    acc = nacc = 0
    payload = bytearray()
    for i in list(indices) + [None]:
        for code in ((clear, i) if i is not None else (eoi,)):
            acc |= code << nacc
            nacc += width_bits
            while nacc >= 8:
                payload.append(acc & 0xFF)
                acc >>= 8
                nacc -= 8
    if nacc:
        payload.append(acc & 0xFF)
    return bytes(payload)


def encode_gif_animated(
    width: int,
    height: int,
    frames,
    palette: bytes,
    rects=None,
    delays=None,
    disposals=None,
    transparent_idx: int = None,
    background: int = 0,
) -> bytes:
    """Multi-frame GIF89a for fixture synthesis: per-frame Graphic
    Control Extensions (disposal method, delay, optional transparency)
    and per-frame rects (defaults to the full canvas)."""
    n_colors = len(palette) // 3
    if n_colors < 2 or n_colors > 256 or (n_colors & (n_colors - 1)):
        raise GifError("encode_palette", "palette size must be a power of two in 2..256")
    depth = max(2, n_colors.bit_length() - 1)
    rects = rects or [(0, 0, width, height)] * len(frames)
    delays = delays or [4] * len(frames)
    disposals = disposals or [0] * len(frames)
    out = bytearray(b"GIF89a")
    out += struct.pack("<HHBBB", width, height, 0x80 | (depth - 1), background, 0)
    out += palette + b"\x00" * (3 * ((1 << depth) - n_colors))
    for idxs, (ix, iy, iw, ih), delay, disp in zip(frames, rects, delays, disposals):
        if len(idxs) != iw * ih:
            raise GifError("encode_size", "frame buffer does not match its rect")
        flags = (disp & 7) << 2
        tidx = 0
        if transparent_idx is not None:
            flags |= 1
            tidx = transparent_idx
        out += b"\x21\xf9\x04" + bytes([flags]) + struct.pack("<H", delay) + bytes([tidx, 0])
        out += b"\x2c" + struct.pack("<HHHH", ix, iy, iw, ih) + b"\x00"
        payload = _lzw_clear_style(idxs, depth)
        out += bytes([depth])
        for i in range(0, len(payload), 255):
            chunk = payload[i : i + 255]
            out += bytes([len(chunk)]) + chunk
        out += b"\x00"
    out += b"\x3b"
    return bytes(out)


def decode_gif_frames(data: bytes, max_frames: int = None) -> Dict:
    """Decode ALL frames of a (possibly animated) GIF with GIF89a
    Graphic Control semantics: transparency index, disposal methods
    0/1 (leave), 2 (restore rect to background color) and 3 (restore
    rect to the previous canvas).  Output frames are fully COMPOSED
    RGB canvases.  Since the output has no alpha channel, "background"
    restores paint the global background color (GCT[bg], black when
    absent) — the documented convention of this pipeline.

    → {width, height, channels=3, frames: [bytes], delays: [centisec],
       n_frames}."""
    hdr = parse_gif_header(data)
    w, h = hdr["width"], hdr["height"]
    packed, bg_idx = data[10], data[11]
    pos = 13
    gct = b""
    if packed & 0x80:
        n = 2 << (packed & 0x07)
        gct = data[pos : pos + 3 * n]
        pos += 3 * n
    bg_rgb = gct[3 * bg_idx : 3 * bg_idx + 3] if len(gct) >= 3 * bg_idx + 3 else b"\x00\x00\x00"
    canvas = bytearray(bg_rgb * (w * h))
    frames, delays = [], []
    gce = None  # (disposal, transparent_idx or None, delay)
    while pos < len(data):
        b0 = data[pos]
        if b0 == 0x3B:
            break
        if b0 == 0x21:
            if pos + 2 > len(data):
                raise GifError("truncated", "extension overruns file")
            label = data[pos + 1]
            body, pos = _sub_blocks(data, pos + 2)
            if label == 0xF9 and len(body) >= 4:
                flags = body[0]
                delay = struct.unpack("<H", body[1:3])[0]
                tidx = body[3] if flags & 1 else None
                gce = ((flags >> 2) & 7, tidx, delay)
            continue
        if b0 != 0x2C:
            raise GifError("corrupt", f"unexpected block 0x{b0:02X}")
        if pos + 10 > len(data):
            raise GifError("truncated", "image descriptor overruns file")
        ix, iy, iw, ih = struct.unpack("<HHHH", data[pos + 1 : pos + 9])
        ipacked = data[pos + 9]
        pos += 10
        lct = b""
        if ipacked & 0x80:
            n = 2 << (ipacked & 0x07)
            lct = data[pos : pos + 3 * n]
            pos += 3 * n
        if pos >= len(data):
            raise GifError("truncated", "missing LZW minimum code size")
        min_code = data[pos]
        if not (2 <= min_code <= 11):
            raise GifError("lzw", f"bad LZW minimum code size {min_code}")
        payload, pos = _sub_blocks(data, pos + 1)
        palette = lct or gct
        if not palette:
            raise GifError("no_palette", "image without global or local color table")
        idx = _lzw_decode_gif(min_code, payload, iw * ih)
        if len(idx) < iw * ih:
            raise GifError("truncated", "LZW data shorter than frame")
        if ipacked & 0x40:  # de-interlace
            rows = []
            for start, step in _INTERLACE:
                rows.extend(range(start, ih, step))
            ordered = bytearray(iw * ih)
            for src_row, dst_row in enumerate(rows):
                ordered[dst_row * iw : (dst_row + 1) * iw] = idx[
                    src_row * iw : (src_row + 1) * iw
                ]
            idx = bytes(ordered)
        disp, tidx, delay = gce if gce else (0, None, 0)
        gce = None  # a GCE applies to exactly one following image
        snapshot = bytes(canvas) if disp == 3 else None
        for row in range(ih):
            y = iy + row
            if y >= h:
                break
            for col in range(min(iw, max(0, w - ix))):
                i = idx[row * iw + col]
                if tidx is not None and i == tidx:
                    continue  # transparent: previous canvas shows through
                off = i * 3
                if off + 3 > len(palette):
                    raise GifError("palette_range", "palette index out of range")
                o = (y * w + ix + col) * 3
                canvas[o : o + 3] = palette[off : off + 3]
        frames.append(bytes(canvas))
        delays.append(delay)
        if max_frames is not None and len(frames) >= max_frames:
            break
        if disp == 2:  # restore rect to background color
            for row in range(ih):
                y = iy + row
                if y >= h:
                    break
                for col in range(min(iw, max(0, w - ix))):
                    o = (y * w + ix + col) * 3
                    canvas[o : o + 3] = bg_rgb
        elif disp == 3 and snapshot is not None:  # restore to previous
            canvas = bytearray(snapshot)
    if not frames:
        raise GifError("no_image", "no image descriptor found")
    return {"width": w, "height": h, "channels": 3, "frames": frames,
            "delays": delays, "n_frames": len(frames)}

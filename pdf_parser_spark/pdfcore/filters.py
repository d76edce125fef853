"""PDF stream filters (ISO 32000-1 §7.4).

FlateDecode (zlib) with PNG/TIFF predictors, LZWDecode with early
change, ASCIIHexDecode, ASCII85Decode, RunLengthDecode.

The reference relies on pdf.js for these (FlateDecode named explicitly
in the north star); this is the from-scratch reimplementation.
"""

from __future__ import annotations

import zlib
from typing import Optional

from .lexer import Name, Ref, StreamObj


class FilterError(ValueError):
    pass


# ----------------------------------------------------------------------
# predictors (shared by Flate and LZW, §7.4.4.4)
# ----------------------------------------------------------------------
def apply_predictor(data: bytes, params: dict) -> bytes:
    predictor = int(params.get("Predictor", 1) or 1)
    if predictor <= 1:
        return data
    colors = int(params.get("Colors", 1) or 1)
    bpc = int(params.get("BitsPerComponent", 8) or 8)
    columns = int(params.get("Columns", 1) or 1)
    bpp = max(1, (colors * bpc + 7) // 8)  # bytes per pixel
    row_len = (columns * colors * bpc + 7) // 8

    if predictor == 2:  # TIFF horizontal differencing
        if bpc != 8:
            raise FilterError("TIFF predictor supported only for 8-bit components")
        out = bytearray(data)
        for r in range(0, len(out) - row_len + 1, row_len):
            for i in range(r + bpp, r + row_len):
                out[i] = (out[i] + out[i - bpp]) & 0xFF
        return bytes(out)

    if predictor >= 10:  # PNG predictors: per-row filter byte
        stride = row_len + 1
        nrows = len(data) // stride
        out = bytearray(nrows * row_len)
        prev = bytearray(row_len)
        for r in range(nrows):
            ft = data[r * stride]
            row = bytearray(data[r * stride + 1 : (r + 1) * stride])
            if ft == 0:  # None
                pass
            elif ft == 1:  # Sub
                for i in range(bpp, row_len):
                    row[i] = (row[i] + row[i - bpp]) & 0xFF
            elif ft == 2:  # Up
                for i in range(row_len):
                    row[i] = (row[i] + prev[i]) & 0xFF
            elif ft == 3:  # Average
                for i in range(row_len):
                    left = row[i - bpp] if i >= bpp else 0
                    row[i] = (row[i] + ((left + prev[i]) >> 1)) & 0xFF
            elif ft == 4:  # Paeth
                for i in range(row_len):
                    a = row[i - bpp] if i >= bpp else 0
                    b = prev[i]
                    c = prev[i - bpp] if i >= bpp else 0
                    p = a + b - c
                    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                    pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
                    row[i] = (row[i] + pred) & 0xFF
            else:
                raise FilterError(f"unknown PNG filter type {ft}")
            out[r * row_len : (r + 1) * row_len] = row
            prev = row
        return bytes(out)

    raise FilterError(f"unknown predictor {predictor}")


# ----------------------------------------------------------------------
# individual filters
# ----------------------------------------------------------------------
def flate_decode(data: bytes, params: Optional[dict] = None) -> bytes:
    try:
        out = zlib.decompress(data)
    except zlib.error:
        # tolerate trailing garbage / missing checksum (raw deflate)
        try:
            out = zlib.decompressobj().decompress(data)
        except zlib.error:
            try:
                out = zlib.decompressobj(-15).decompress(data)
            except zlib.error as e:
                raise FilterError(f"FlateDecode failed: {e}") from None
    if params:
        out = apply_predictor(out, params)
    return out


def lzw_decode(data: bytes, params: Optional[dict] = None) -> bytes:
    """LZW per §7.4.4.2 (MSB-first codes, EarlyChange default 1)."""
    early = 1
    if params and "EarlyChange" in params:
        early = int(params["EarlyChange"])

    out = bytearray()
    table: list = [bytes([i]) for i in range(256)] + [b"", b""]  # 256=clear, 257=eod
    code_width = 9
    prev: Optional[bytes] = None
    bitbuf = 0
    nbits = 0
    for byte in data:
        bitbuf = (bitbuf << 8) | byte
        nbits += 8
        while nbits >= code_width:
            nbits -= code_width
            code = (bitbuf >> nbits) & ((1 << code_width) - 1)
            if code == 256:
                table = table[:258]
                code_width = 9
                prev = None
                continue
            if code == 257:
                return bytes(out)
            if prev is None:
                entry = table[code]
            elif code < len(table):
                entry = table[code]
                table.append(prev + entry[:1])
            elif code == len(table):
                entry = prev + prev[:1]
                table.append(entry)
            else:
                raise FilterError(f"bad LZW code {code}")
            out.extend(entry)
            prev = entry
            if len(table) + early - 1 >= (1 << code_width) and code_width < 12:
                code_width += 1
    result = bytes(out)
    if params:
        result = apply_predictor(result, params)
    return result


def asciihex_decode(data: bytes, params: Optional[dict] = None) -> bytes:
    digits = bytearray()
    for b in data:
        if b in b"0123456789abcdefABCDEF":
            digits.append(b)
        elif b == 0x3E:  # '>'
            break
        elif bytes([b]) in b"\x00\t\n\x0c\r ":
            continue
        else:
            raise FilterError(f"bad ASCIIHex byte {b!r}")
    if len(digits) % 2 == 1:
        digits.append(0x30)
    return bytes.fromhex(digits.decode("ascii"))


def ascii85_decode(data: bytes, params: Optional[dict] = None) -> bytes:
    if data.startswith(b"<~"):
        data = data[2:]
    end = data.find(b"~>")
    if end >= 0:
        data = data[:end]
    out = bytearray()
    group: list = []
    for b in data:
        if bytes([b]) in b"\x00\t\n\x0c\r ":
            continue
        if b == 0x7A and not group:  # 'z' shortcut
            out.extend(b"\x00\x00\x00\x00")
            continue
        if not (0x21 <= b <= 0x75):
            raise FilterError(f"bad ASCII85 byte {b!r}")
        group.append(b - 0x21)
        if len(group) == 5:
            v = 0
            for g in group:
                v = v * 85 + g
            out.extend(v.to_bytes(4, "big"))
            group = []
    if group:
        k = len(group)
        group += [84] * (5 - k)
        v = 0
        for g in group:
            v = v * 85 + g
        out.extend(v.to_bytes(4, "big")[: k - 1])
    return bytes(out)


def runlength_decode(data: bytes, params: Optional[dict] = None) -> bytes:
    out = bytearray()
    i = 0
    n = len(data)
    while i < n:
        length = data[i]
        i += 1
        if length == 128:
            break
        if length < 128:
            out.extend(data[i : i + length + 1])
            i += length + 1
        else:
            if i < n:
                out.extend(bytes([data[i]]) * (257 - length))
                i += 1
    return bytes(out)


_FILTERS = {
    "FlateDecode": flate_decode,
    "Fl": flate_decode,
    "LZWDecode": lzw_decode,
    "LZW": lzw_decode,
    "ASCIIHexDecode": asciihex_decode,
    "AHx": asciihex_decode,
    "ASCII85Decode": ascii85_decode,
    "A85": ascii85_decode,
    "RunLengthDecode": runlength_decode,
    "RL": runlength_decode,
}


def decode_stream(stream: StreamObj, resolver=None) -> bytes:
    """Apply the stream's /Filter chain to its raw bytes.

    ``resolver`` resolves indirect references inside /Filter or
    /DecodeParms if present. Unknown filters raise FilterError (the
    extraction stage records these as decode failures, mirroring the
    per-page error tolerance of the reference at
    ``src/services/pdfParser/index.ts:65-68``).
    """

    def res(v):
        return resolver(v) if (resolver is not None and isinstance(v, Ref)) else v

    filt = res(stream.dict.get("Filter"))
    data = stream.raw
    if filt is None:
        return data
    parms = res(stream.dict.get("DecodeParms")) or res(stream.dict.get("DP"))
    if isinstance(filt, (Name, str)):
        filt = [filt]
        parms = [parms]
    elif not isinstance(parms, list):
        parms = [parms] * len(filt)
    for f, p in zip(filt, parms):
        fn = _FILTERS.get(str(res(f)))
        if fn is None:
            raise FilterError(f"unsupported filter {f!r}")
        p = res(p)
        data = fn(data, p if isinstance(p, dict) else None)
    return data

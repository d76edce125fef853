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
# below this size the pure-Python loops beat numpy call overhead (tiny
# xref predictor streams, thumbnail rows); above it the vector kernels
# win by 1-2 orders of magnitude — output bytes are identical either way
_VECTOR_MIN_BYTES = 1024


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
        if len(data) >= _VECTOR_MIN_BYTES:
            return _tiff_unfilter_vector(data, row_len, bpp)
        out = bytearray(data)
        for r in range(0, len(out) - row_len + 1, row_len):
            for i in range(r + bpp, r + row_len):
                out[i] = (out[i] + out[i - bpp]) & 0xFF
        return bytes(out)

    if predictor >= 10:  # PNG predictors: per-row filter byte
        stride = row_len + 1
        nrows = len(data) // stride
        if nrows * row_len >= _VECTOR_MIN_BYTES:
            vec = _png_unfilter_vector(data, nrows, row_len, bpp)
            if vec is not None:
                return vec
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


def _tiff_unfilter_vector(data: bytes, row_len: int, bpp: int) -> bytes:
    """TIFF horizontal differencing as a per-row lag-``bpp`` prefix sum:
    reshape each row to (groups, bpp) and cumsum down the group axis in
    uint8 (wrapping = mod-256, exactly the scalar loop's `& 0xFF`).
    Trailing partial row is left untouched, like the scalar path."""
    import numpy as np

    nrows = len(data) // row_len
    if nrows == 0 or row_len <= bpp:
        return data
    k = (row_len + bpp - 1) // bpp
    body = np.frombuffer(data[: nrows * row_len], dtype=np.uint8).reshape(
        nrows, row_len
    )
    padded = np.zeros((nrows, k * bpp), dtype=np.uint8)
    padded[:, :row_len] = body
    acc = np.cumsum(padded.reshape(nrows, k, bpp), axis=1, dtype=np.uint8)
    out = acc.reshape(nrows, k * bpp)[:, :row_len].tobytes()
    return out + data[nrows * row_len :]


def _png_unfilter_vector(data: bytes, nrows: int, row_len: int, bpp: int) -> bytes:
    """Row-hybrid PNG unfilter (round-5, VERDICT item 2).

    None/Sub/Up rows vectorize exactly: Sub is a lag-``bpp`` prefix sum
    (reshape to (groups, bpp) lanes and uint8-cumsum down the group
    axis — wraparound = the scalar loop's ``& 0xFF``), Up is one vector
    add against the previous reconstructed row.  Average and Paeth are
    genuinely sequential in the left neighbor (measured: an
    anti-diagonal wavefront's per-step numpy overhead cancels the win
    at realistic widths), so those rows keep the tight byte loop — the
    hybrid is bit-identical to the scalar path and never slower.

    Returns ``None`` when fewer than a quarter of the rows are
    vectorizable — there the per-row numpy round trips only tax the
    byte loops (~20% on an all-Paeth image), so the caller's plain
    scalar path is the right engine."""
    import numpy as np

    stride = row_len + 1
    a = np.frombuffer(data[: nrows * stride], dtype=np.uint8).reshape(nrows, stride)
    ft = a[:, 0]
    bad = ft > 4
    if bad.any():
        raise FilterError(f"unknown PNG filter type {int(ft[np.argmax(bad)])}")
    if nrows and np.count_nonzero(ft < 3) < nrows / 4:
        return None
    k = (row_len + bpp - 1) // bpp
    pad = k * bpp - row_len
    out = np.zeros((nrows, k * bpp), dtype=np.uint8)
    raw8 = a[:, 1:]
    prev = np.zeros(k * bpp, dtype=np.uint8)
    for y in range(nrows):
        f = ft[y]
        if f == 0:
            out[y, :row_len] = raw8[y]
        elif f == 1:  # Sub: per-lane prefix sum, uint8 wrap = mod 256
            row = out[y]
            row[:row_len] = raw8[y]
            out[y] = np.cumsum(
                row.reshape(k, bpp), axis=0, dtype=np.uint8
            ).reshape(k * bpp)
        elif f == 2:  # Up
            out[y, :row_len] = raw8[y] + prev[:row_len]  # uint8 wrap
        else:  # Average / Paeth: sequential left dependency → byte loop
            row = bytearray(raw8[y].tobytes())
            pv = prev.tobytes()  # Python ints, not numpy scalars
            if f == 3:
                for i in range(row_len):
                    left = row[i - bpp] if i >= bpp else 0
                    row[i] = (row[i] + ((left + pv[i]) >> 1)) & 0xFF
            else:
                for i in range(row_len):
                    a_ = row[i - bpp] if i >= bpp else 0
                    b_ = pv[i]
                    c_ = pv[i - bpp] if i >= bpp else 0
                    p = a_ + b_ - c_
                    pa, pb, pc = abs(p - a_), abs(p - b_), abs(p - c_)
                    pred = (
                        a_
                        if (pa <= pb and pa <= pc)
                        else (b_ if pb <= pc else c_)
                    )
                    row[i] = (row[i] + pred) & 0xFF
            out[y, :row_len] = np.frombuffer(bytes(row), dtype=np.uint8)
        prev = out[y]
    if pad:
        return out[:, :row_len].tobytes()
    return out.tobytes()


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

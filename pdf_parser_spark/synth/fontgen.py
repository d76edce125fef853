"""Minimal embedded font programs for the fixture corpus (round-5).

Synthesizes REAL font binaries so the parser's embedded-font path
(``pdfcore/fontprog.py``) has oracle-live fixtures:

- a TrueType sfnt with a ``cmap`` (format 0 / 4 / 6, rotating) and a
  format-2.0 ``post`` table naming every glyph — the symbolic-font
  shape a crawl PDF carries when it has no /ToUnicode;
- a Type1 font program whose cleartext header carries a custom
  ``/Encoding`` vector (``dup <code> /<name> put``), with a dummy
  eexec section (charstrings are irrelevant for text extraction).

Both use PRIVATE code assignments distinct from ASCII (a multiplier
permutation), so a decoder that silently falls back to Standard
encoding produces garbage — the roundtrip oracle only passes if the
font program was actually parsed.

Like the rest of ``synth``, this module must NOT import the parser:
the glyph-name table below is duplicated on purpose from the public
Adobe Glyph List conventions.
"""

from __future__ import annotations

import struct
from functools import lru_cache
from typing import Dict, List, Tuple

# AGL names for the printable ASCII range (public Adobe Glyph List).
_ASCII_NAMES = {
    " ": "space", "!": "exclam", '"': "quotedbl", "#": "numbersign",
    "$": "dollar", "%": "percent", "&": "ampersand", "'": "quotesingle",
    "(": "parenleft", ")": "parenright", "*": "asterisk", "+": "plus",
    ",": "comma", "-": "hyphen", ".": "period", "/": "slash",
    "0": "zero", "1": "one", "2": "two", "3": "three", "4": "four",
    "5": "five", "6": "six", "7": "seven", "8": "eight", "9": "nine",
    ":": "colon", ";": "semicolon", "<": "less", "=": "equal",
    ">": "greater", "?": "question", "@": "at", "[": "bracketleft",
    "\\": "backslash", "]": "bracketright", "^": "asciicircum",
    "_": "underscore", "`": "grave", "{": "braceleft", "|": "bar",
    "}": "braceright", "~": "asciitilde", "€": "Euro",
}
for _c in range(ord("A"), ord("z") + 1):
    if chr(_c).isalpha():
        _ASCII_NAMES[chr(_c)] = chr(_c)
del _c


def _glyph_name(ch: str) -> str:
    return _ASCII_NAMES.get(ch, f"uni{ord(ch):04X}")


def _perm_codes(mult: int, special: Dict[str, int]) -> Dict[str, int]:
    """char → PRIVATE code: 33 + ((ord-32)*mult) % 95 for ASCII 32..126
    (mult coprime with 95 → bijection), plus explicit specials."""
    out = dict(special)
    for o in range(32, 127):
        out[chr(o)] = 33 + ((o - 32) * mult) % 95
    return out


F3_CODE: Dict[str, int] = _perm_codes(7, {"€": 1})   # TrueType fixture font
F4_CODE: Dict[str, int] = _perm_codes(3, {"€": 2})   # Type1 fixture font


def _encode(s: str, table: Dict[str, int], font: str) -> bytes:
    out = bytearray()
    for ch in s:
        code = table.get(ch)
        if code is None:
            raise ValueError(f"char {ch!r} not encodable in {font}")
        out.append(code)
    return bytes(out)


def f3_encode(s: str) -> bytes:
    return _encode(s, F3_CODE, "F3")


def f4_encode(s: str) -> bytes:
    return _encode(s, F4_CODE, "F4")


# ----------------------------------------------------------------------
# TrueType (sfnt) assembly
# ----------------------------------------------------------------------
def _sfnt(tables: List[Tuple[bytes, bytes]]) -> bytes:
    """Assemble an sfnt from (tag, data) pairs with real checksums."""
    n = len(tables)
    entry_sel = max(0, n.bit_length() - 1)
    search_range = 16 * (1 << entry_sel)
    out = bytearray(struct.pack(
        ">IHHHH", 0x00010000, n, search_range, entry_sel, 16 * n - search_range
    ))
    off = 12 + 16 * n
    dir_entries = []
    body = bytearray()
    for tag, data in sorted(tables):
        pad = (-len(data)) % 4
        padded = data + b"\x00" * pad
        csum = sum(
            struct.unpack(f">{len(padded)//4}I", padded)
        ) & 0xFFFFFFFF
        dir_entries.append(struct.pack(">4sIII", tag, csum, off, len(data)))
        body += padded
        off += len(padded)
    out += b"".join(dir_entries) + body
    return bytes(out)


def _cmap_fmt0(code_to_gid: Dict[int, int], plat: Tuple[int, int]) -> bytes:
    arr = bytearray(256)
    for c, g in code_to_gid.items():
        if c < 256:
            arr[c] = g & 0xFF
    sub = struct.pack(">HHH", 0, 262, 0) + bytes(arr)
    return struct.pack(">HH", 0, 1) + struct.pack(">HHI", plat[0], plat[1], 12) + sub


def _cmap_fmt4(code_to_gid: Dict[int, int], plat: Tuple[int, int]) -> bytes:
    # one segment per contiguous (code, gid) run + the mandatory 0xFFFF
    codes = sorted(code_to_gid)
    segs: List[Tuple[int, int, int]] = []  # (start, end, delta)
    for c in codes:
        d = (code_to_gid[c] - c) & 0xFFFF
        if segs and segs[-1][1] == c - 1 and segs[-1][2] == d:
            segs[-1] = (segs[-1][0], c, d)
        else:
            segs.append((c, c, d))
    segs.append((0xFFFF, 0xFFFF, 1))  # maps 0xFFFF -> 0 (notdef)
    n = len(segs)
    entry_sel = max(0, n.bit_length() - 1)
    search_range = 2 * (1 << entry_sel)
    hdr = struct.pack(
        ">HHHHHHH", 4, 16 + 8 * n, 0, 2 * n, search_range, entry_sel,
        2 * n - search_range,
    )
    ends = struct.pack(f">{n}H", *[s[1] for s in segs])
    starts = struct.pack(f">{n}H", *[s[0] for s in segs])
    deltas = struct.pack(f">{n}H", *[s[2] for s in segs])
    range_offs = struct.pack(f">{n}H", *([0] * n))
    sub = hdr + ends + b"\x00\x00" + starts + deltas + range_offs
    return struct.pack(">HH", 0, 1) + struct.pack(">HHI", plat[0], plat[1], 12) + sub


def _cmap_fmt6(code_to_gid: Dict[int, int], plat: Tuple[int, int]) -> bytes:
    first, last = min(code_to_gid), max(code_to_gid)
    gids = [code_to_gid.get(c, 0) for c in range(first, last + 1)]
    sub = struct.pack(
        f">HHHHH{len(gids)}H", 6, 10 + 2 * len(gids), 0, first, len(gids), *gids
    )
    return struct.pack(">HH", 0, 1) + struct.pack(">HHI", plat[0], plat[1], 12) + sub


def _post_v2(gid_names: List[str], use_std: bool) -> bytes:
    """post 2.0: standard Mac indices for ASCII when ``use_std`` (index
    = codepoint - 29), custom Pascal-string names otherwise."""
    hdr = struct.pack(">IihhIIIII", 0x00020000, 0, 0, 0, 0, 0, 0, 0, 0)
    indices: List[int] = []
    pool: List[bytes] = []
    for name in gid_names:
        if (
            use_std
            and len(name) == 1
            and 32 <= ord(name) <= 126
        ):
            indices.append(ord(name) - 29)
        elif use_std and name in _STD_NAME_TO_CP:
            indices.append(_STD_NAME_TO_CP[name] - 29)
        else:
            indices.append(258 + len(pool))
            pool.append(name.encode("latin-1"))
    body = struct.pack(f">H{len(indices)}H", len(indices), *indices)
    for nm in pool:
        body += bytes([len(nm)]) + nm
    return hdr + body


_STD_NAME_TO_CP = {v: ord(k) for k, v in _ASCII_NAMES.items() if ord(k) < 127}


@lru_cache(maxsize=None)  # deterministic per (style, names) — one build
def build_truetype_font(style: str = "mac0", use_std_names: bool = True) -> bytes:
    """The F3 fixture font: gids assigned in code order, names per
    glyph via ``post``.  ``style``:

    - ``mac0``: (1,0) format-0 byte cmap (classic symbolic Mac shape)
    - ``sym4``: (3,0) format-4 cmap keyed at 0xF000|code (Windows
      symbol shape — decoder must apply the F000 alias)
    - ``fmt6``: (1,0) format-6 trimmed array
    """
    items = sorted((code, ch) for ch, code in F3_CODE.items())
    gid_names = [".notdef"] + [_glyph_name(ch) for _, ch in items]
    code_to_gid = {code: gid + 1 for gid, (code, _ch) in enumerate(items)}
    if style == "mac0":
        cmap = _cmap_fmt0(code_to_gid, (1, 0))
    elif style == "sym4":
        cmap = _cmap_fmt4({0xF000 | c: g for c, g in code_to_gid.items()}, (3, 0))
    elif style == "fmt6":
        cmap = _cmap_fmt6(code_to_gid, (1, 0))
    else:
        raise ValueError(f"unknown cmap style {style!r}")
    return _sfnt([(b"cmap", cmap), (b"post", _post_v2(gid_names, use_std_names))])


# ----------------------------------------------------------------------
# CFF (Type1C) assembly — the modern /FontFile3 shape
# ----------------------------------------------------------------------
def _cff_index_bytes(items: List[bytes]) -> bytes:
    """CFF INDEX with offSize 2 (valid while data < 64 KiB)."""
    if not items:
        return struct.pack(">H", 0)
    out = struct.pack(">HB", len(items), 2)
    off = 1
    offs = [off]
    for it in items:
        off += len(it)
        offs.append(off)
    out += b"".join(struct.pack(">H", o) for o in offs)
    return out + b"".join(items)


@lru_cache(maxsize=1)  # fully deterministic — one build per process
def build_cff_font() -> bytes:
    """A bare CFF (Type1C) font carrying the F4 code table: Encoding
    format 0 maps the private codes to gids, charset format 0 maps gids
    to SIDs (standard ASCII SIDs = codepoint-31; 'Euro' via the String
    INDEX), CharStrings are single endchar ops (text extraction never
    rasterizes)."""
    items = sorted((code, ch) for ch, code in F4_CODE.items())
    n = len(items)
    strings: List[bytes] = []
    sids: List[int] = []
    for _code, ch in items:
        o = ord(ch)
        if 32 <= o <= 126:
            sids.append(o - 31)  # standard SID block
        else:
            sids.append(391 + len(strings))
            strings.append(_glyph_name(ch).encode("latin-1"))
    name_index = _cff_index_bytes([b"SynthCFF"])
    string_index = _cff_index_bytes(strings)
    gsubr_index = _cff_index_bytes([])
    encoding = bytes([0, n] + [code for code, _ch in items])
    charset = bytes([0]) + b"".join(struct.pack(">H", s) for s in sids)
    charstrings = _cff_index_bytes([b"\x0e"] * (n + 1))  # endchar each

    def op(val: int, operator: int) -> bytes:
        return struct.pack(">Bi", 29, val) + bytes([operator])

    top_size = 3 * 6  # three (5-byte int32 operand + 1-byte operator)
    topdict_index_size = 2 + 1 + 2 * 2 + top_size
    base = 4 + len(name_index) + topdict_index_size + len(string_index) + len(gsubr_index)
    enc_off = base
    charset_off = enc_off + len(encoding)
    cs_off = charset_off + len(charset)
    top = op(charset_off, 15) + op(enc_off, 16) + op(cs_off, 17)
    topdict_index = _cff_index_bytes([top])
    assert len(topdict_index) == topdict_index_size
    return (
        bytes([1, 0, 4, 2])  # header: major 1, minor 0, hdrSize, offSize
        + name_index + topdict_index + string_index + gsubr_index
        + encoding + charset + charstrings
    )


# ----------------------------------------------------------------------
# Type1 assembly
# ----------------------------------------------------------------------
@lru_cache(maxsize=1)  # fully deterministic — one build per process
def build_type1_font() -> Tuple[bytes, int, int, int]:
    """The F4 fixture font → (bytes, Length1, Length2, Length3).

    Cleartext header with the custom /Encoding vector, a deterministic
    pseudo-binary eexec section, and the conventional 512-zeros +
    cleartomark trailer."""
    enc_lines = "".join(
        f"dup {code} /{_glyph_name(ch)} put\n"
        for code, ch in sorted((c, ch) for ch, c in F4_CODE.items())
    )
    clear = (
        "%!PS-AdobeFont-1.0: SynthT1 001.001\n"
        "/FontName /SynthT1 def\n"
        "/PaintType 0 def\n"
        "/FontType 1 def\n"
        "/FontMatrix [0.001 0 0 0.001 0 0] readonly def\n"
        "/Encoding 256 array\n"
        "0 1 255 {1 index exch /.notdef put} for\n"
        + enc_lines
        + "readonly def\n"
        "currentdict end\n"
        "currentfile eexec\n"
    ).encode("latin-1")
    binary = bytes((i * 73 + 41) & 0xFF for i in range(256))
    trailer = (b"0" * 64 + b"\n") * 8 + b"cleartomark\n"
    return clear + binary + trailer, len(clear), len(binary), len(trailer)

"""Deterministic PDF writer for fixture generation.

Emits spec-conformant PDFs exercising every structure FIXTURES.md §2
lists: classic xref tables and PDF-1.5 xref streams, uncompressed and
FlateDecode content streams, multi-page documents, WinAnsi fonts and a
/ToUnicode CMap font (beginbfchar + beginbfrange), and the full text
operator set (Td, TD, Tm, T*, Tj, TJ-with-kerning, ').

Golden text is computed HERE from the strings the builder was asked to
place — independently of ``pdfcore`` — using the frozen contract:
page text = '\\n'.join(one str per show op), doc text =
'\\f'.join(pages); TJ elements concatenate, with a space for kerning
<= -200. The white-text row is written with a degenerate text matrix
(``0 0 0 1 x y Tm`` → transform[0] == 0, the predicate of
``src/services/pdfParser/metadata.ts:41``).
"""

from __future__ import annotations

import zlib
from typing import Dict, List, Optional, Sequence, Tuple, Union

TJElem = Union[str, float, int]

# mirror of content.TJ_SPACE_KERN, duplicated on purpose: the golden
# path must not import the parser
_TJ_SPACE_KERN = -200.0

# ToUnicode demo font (F2): single-byte codes
#   0x01 -> U+20AC EURO, 0x02 -> U+FB01 fi-ligature  (beginbfchar)
#   0x41..0x5A -> A..Z, 0x61..0x7A -> a..z, 0x20 -> space, 0x30..0x39
#   digits (beginbfrange)
F2_BFCHAR = {0x01: "€", 0x02: "ﬁ"}
F2_BFRANGES = [(0x20, 0x20, 0x20), (0x30, 0x39, 0x30), (0x41, 0x5A, 0x41), (0x61, 0x7A, 0x61)]


def f2_encode(s: str) -> bytes:
    """Encode a string into F2's private code space."""
    inv = {v: k for k, v in F2_BFCHAR.items()}
    out = bytearray()
    for ch in s:
        if ch in inv:
            out.append(inv[ch])
        else:
            o = ord(ch)
            ok = any(lo <= o <= hi for lo, hi, _ in F2_BFRANGES)
            if not ok:
                raise ValueError(f"char {ch!r} not encodable in F2")
            out.append(o)
    return bytes(out)


def _enc_for(font: str):
    """Per-font show-string encoder: F1 = WinAnsi bytes, F2 = the
    ToUnicode demo code space, F3/F4 = the embedded-font private code
    permutations (see fontgen)."""
    if font == "F1":
        return lambda s: s.encode("cp1252")
    if font in ("F3", "F4"):
        from .fontgen import f3_encode, f4_encode

        return f3_encode if font == "F3" else f4_encode
    return f2_encode


def _esc_literal(data: bytes) -> bytes:
    return (
        data.replace(b"\\", b"\\\\")
        .replace(b"(", b"\\(")
        .replace(b")", b"\\)")
        .replace(b"\r", b"\\r")
        .replace(b"\n", b"\\n")
    )


def _fmt_num(x: float) -> str:
    if isinstance(x, int) or float(x).is_integer():
        return str(int(x))
    return f"{x:g}"


class PageBuilder:
    """Accumulates content-stream ops and the golden item strings."""

    def __init__(self):
        self.ops: List[bytes] = []
        self.golden_items: List[str] = []
        self.whitetext_parts: List[str] = []

    # -- simple visible text -------------------------------------------
    def text(self, x: float, y: float, s: str, font: str = "F1", size: float = 12):
        raw = _esc_literal(_enc_for(font)(s))
        self.ops.append(
            f"BT /{font} {_fmt_num(size)} Tf {_fmt_num(x)} {_fmt_num(y)} Td ".encode()
            + b"(" + raw + b") Tj ET"
        )
        self.golden_items.append(s)

    def text_lines(
        self, x: float, y: float, lines: Sequence[str], leading: float = 14,
        font: str = "F1", size: float = 12, style: str = "TD",
    ):
        """Multi-line text using TD / T* / ' — one item per line."""
        _e = _enc_for(font)
        enc = lambda s: _esc_literal(_e(s))
        parts = [f"BT /{font} {_fmt_num(size)} Tf {_fmt_num(x)} {_fmt_num(y)} Td".encode()]
        for i, line in enumerate(lines):
            raw = enc(line)
            if i == 0:
                parts.append(b"(" + raw + b") Tj")
                parts.append(f"0 -{_fmt_num(leading)} TD".encode())
            elif style == "quote":
                parts.append(b"(" + raw + b") '")
            elif style == "Tstar":
                parts.append(b"T* (" + raw + b") Tj")
            else:  # TD each line
                parts.append(b"(" + raw + b") Tj " + f"0 -{_fmt_num(leading)} TD".encode())
            self.golden_items.append(line)
        parts.append(b"ET")
        self.ops.append(b" ".join(parts))

    def tj(self, x: float, y: float, elems: Sequence[TJElem], font: str = "F1", size: float = 12):
        """A TJ array with kerning numbers; golden per the frozen contract."""
        enc = _enc_for(font)
        arr = bytearray(b"[")
        golden: List[str] = []
        for el in elems:
            if isinstance(el, str):
                arr += b"(" + _esc_literal(enc(el)) + b") "
                golden.append(el)
            else:
                arr += f"{_fmt_num(float(el))} ".encode()
                if float(el) <= _TJ_SPACE_KERN:
                    golden.append(" ")
        arr += b"]"
        self.ops.append(
            f"BT /{font} {_fmt_num(size)} Tf {_fmt_num(x)} {_fmt_num(y)} Td ".encode()
            + bytes(arr) + b" TJ ET"
        )
        self.golden_items.append("".join(golden))

    def white_text(self, s: str, x: float = 10, y: float = 5, font: str = "F1"):
        """Invisible metadata run: text matrix with a == 0."""
        raw = _esc_literal(_enc_for(font)(s))
        self.ops.append(
            f"BT /{font} 8 Tf 0 0 0 1 {_fmt_num(x)} {_fmt_num(y)} Tm ".encode()
            + b"(" + raw + b") Tj ET"
        )
        self.golden_items.append(s)
        self.whitetext_parts.append(s)

    def content(self) -> bytes:
        return b"\n".join(self.ops)

    def golden_text(self) -> str:
        return "\n".join(self.golden_items)

    def golden_whitetext(self) -> str:
        return "".join(p for p in self.whitetext_parts if p.strip())


class PdfBuilder:
    """Assembles objects into a full PDF file."""

    def __init__(self, compress: bool = False, xref_stream: bool = False,
                 encrypt_rc4: Optional[dict] = None, objstm: bool = False,
                 embedded_fonts: Optional[dict] = None):
        if objstm and not xref_stream:
            raise ValueError("objstm requires xref_stream (type-2 entries)")
        self.compress = compress
        self.xref_stream = xref_stream
        # embedded_fonts: e.g. {"tt_style": "mac0", "tt_std_names": True}
        # adds F3 (embedded TrueType, /FontFile2, NO /ToUnicode, NO
        # /Encoding) and F4 (embedded Type1, /FontFile with a custom
        # built-in /Encoding) to every page's resources — the round-5
        # symbolic-font fixtures
        self.embedded_fonts = embedded_fonts
        # objstm: pack every non-stream object into ONE /Type /ObjStm
        # (the modern-PDF default layout; with encryption the container
        # stream is encrypted and its members stay plaintext, per spec)
        self.objstm = objstm
        self._objstm_entries: Dict[int, Tuple[int, int]] = {}
        # encrypt_rc4: e.g. {'r': 3, 'length': 128} — synthesize a
        # standard-security-handler document (empty user password) so
        # the pdfcore RC4 decrypt path has real fixtures to chew on
        self.encrypt_rc4 = encrypt_rc4
        self.objects: List[Optional[bytes]] = [None]  # 1-based numbering
        self.pages: List[PageBuilder] = []

    def _add(self, body: bytes) -> int:
        self.objects.append(body)
        return len(self.objects) - 1

    def _add_stream(self, d: str, data: bytes, force_raw: bool = False) -> int:
        filt = ""
        if self.compress and not force_raw:
            data = zlib.compress(data)
            filt = " /Filter /FlateDecode"
        head = f"<< {d} /Length {len(data)}{filt} >>".encode()
        return self._add(head + b"\nstream\n" + data + b"\nendstream")

    def new_page(self) -> PageBuilder:
        pb = PageBuilder()
        self.pages.append(pb)
        return pb

    def _font_objects(self) -> Tuple[int, int]:
        f1 = self._add(
            b"<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica "
            b"/Encoding /WinAnsiEncoding >>"
        )
        # ToUnicode CMap for F2
        ranges = "\n".join(
            f"<{lo:02X}> <{hi:02X}> <{dst:04X}>" for lo, hi, dst in F2_BFRANGES
        )
        chars = "\n".join(f"<{src:02X}> <{ord(dst):04X}>" for src, dst in F2_BFCHAR.items())
        cmap = f"""/CIDInit /ProcSet findresource begin
12 dict begin
begincmap
/CMapName /F2toUnicode def
/CMapType 2 def
1 begincodespacerange
<00> <FF>
endcodespacerange
{len(F2_BFCHAR)} beginbfchar
{chars}
endbfchar
{len(F2_BFRANGES)} beginbfrange
{ranges}
endbfrange
endcmap
CMapName currentdict /CMap defineresource pop
end
end""".encode()
        tu = self._add_stream("", cmap)
        f2 = self._add(
            f"<< /Type /Font /Subtype /Type1 /BaseFont /Custom "
            f"/ToUnicode {tu} 0 R >>".encode()
        )
        return f1, f2

    def _embedded_font_objects(self) -> Tuple[int, int]:
        """F3 (TrueType /FontFile2) and F4 (Type1 /FontFile): real font
        programs, no /ToUnicode, no /Encoding — glyph→unicode must come
        from the font program itself (parser's fontprog path)."""
        from .fontgen import build_truetype_font, build_type1_font

        cfg = self.embedded_fonts or {}
        tt = build_truetype_font(
            style=cfg.get("tt_style", "mac0"),
            use_std_names=bool(cfg.get("tt_std_names", True)),
        )
        ff2 = self._add_stream("", tt)
        d3 = self._add(
            f"<< /Type /FontDescriptor /FontName /SynthTT /Flags 4 "
            f"/ItalicAngle 0 /Ascent 800 /Descent -200 /CapHeight 700 "
            f"/StemV 80 /FontBBox [0 -200 1000 800] /FontFile2 {ff2} 0 R >>".encode()
        )
        f3 = self._add(
            f"<< /Type /Font /Subtype /TrueType /BaseFont /SynthTT "
            f"/FontDescriptor {d3} 0 R >>".encode()
        )
        if cfg.get("t1_flavor", "type1") == "cff":
            # modern shape: bare CFF (Type1C) in /FontFile3
            from .fontgen import build_cff_font

            cff = build_cff_font()
            ff = self._add_stream("/Subtype /Type1C", cff)
            d4 = self._add(
                f"<< /Type /FontDescriptor /FontName /SynthCFF /Flags 4 "
                f"/ItalicAngle 0 /Ascent 800 /Descent -200 /CapHeight 700 "
                f"/StemV 80 /FontBBox [0 -200 1000 800] /FontFile3 {ff} 0 R >>".encode()
            )
            f4 = self._add(
                f"<< /Type /Font /Subtype /Type1 /BaseFont /SynthCFF "
                f"/FontDescriptor {d4} 0 R >>".encode()
            )
            return f3, f4
        t1, l1, l2, l3 = build_type1_font()
        ff = self._add_stream(f"/Length1 {l1} /Length2 {l2} /Length3 {l3}", t1)
        d4 = self._add(
            f"<< /Type /FontDescriptor /FontName /SynthT1 /Flags 4 "
            f"/ItalicAngle 0 /Ascent 800 /Descent -200 /CapHeight 700 "
            f"/StemV 80 /FontBBox [0 -200 1000 800] /FontFile {ff} 0 R >>".encode()
        )
        f4 = self._add(
            f"<< /Type /Font /Subtype /Type1 /BaseFont /SynthT1 "
            f"/FontDescriptor {d4} 0 R >>".encode()
        )
        return f3, f4

    def build(self) -> bytes:
        if not self.pages:
            raise ValueError("no pages")
        f1, f2 = self._font_objects()
        extra_fonts = ""
        if self.embedded_fonts is not None:
            f3, f4 = self._embedded_font_objects()
            extra_fonts = f" /F3 {f3} 0 R /F4 {f4} 0 R"
        content_ids = [self._add_stream("", pb.content()) for pb in self.pages]
        n_pages = len(self.pages)
        # reserve ids: pages-tree node, page nodes, catalog
        pages_id = len(self.objects)
        self.objects.append(None)
        page_ids = []
        for cid in content_ids:
            pid = self._add(
                f"<< /Type /Page /Parent {pages_id} 0 R /MediaBox [0 0 612 792] "
                f"/Resources << /Font << /F1 {f1} 0 R /F2 {f2} 0 R{extra_fonts} >> >> "
                f"/Contents {cid} 0 R >>".encode()
            )
            page_ids.append(pid)
        kids = " ".join(f"{p} 0 R" for p in page_ids)
        self.objects[pages_id] = (
            f"<< /Type /Pages /Kids [{kids}] /Count {n_pages} >>".encode()
        )
        catalog_id = self._add(f"<< /Type /Catalog /Pages {pages_id} 0 R >>".encode())

        self._objstm_entries = {}
        if self.objstm:
            # pack BEFORE encryption: members are stored plaintext
            # inside the container, which is then encrypted as a stream
            members = [
                (num, body) for num, body in enumerate(self.objects)
                if num and body is not None and b"\nstream\n" not in body
            ]
            payload = bytearray()
            pairs = []
            for num, body in members:
                pairs.append((num, len(payload)))
                payload += body + b"\n"
            hdr = " ".join(f"{n} {o}" for n, o in pairs).encode() + b"\n"
            data = bytes(hdr) + bytes(payload)
            filt = ""
            if self.compress:
                data = zlib.compress(data)
                filt = " /Filter /FlateDecode"
            stm_id = len(self.objects)
            self.objects.append(
                (f"<< /Type /ObjStm /N {len(pairs)} /First {len(hdr)}"
                 f" /Length {len(data)}{filt} >>").encode()
                + b"\nstream\n" + data + b"\nendstream"
            )
            for idx, (num, _) in enumerate(members):
                self.objects[num] = None
                self._objstm_entries[num] = (stm_id, idx)

        enc_id = None
        extra_trailer = ""
        if self.encrypt_rc4:
            import hashlib as _hl

            from ..pdfcore.crypt import (
                StandardSecurityHandler,
                make_encrypt_params,
                make_encrypt_params_v5,
            )

            mode = self.encrypt_rc4.get("mode", "rc4")
            # round-5: optional non-empty passwords in the fixture
            user_pw = self.encrypt_rc4.get("user_pw", b"")
            owner_pw = self.encrypt_rc4.get("owner_pw")
            id0 = _hl.md5(b"pdfgen-fixture-" + str(len(self.objects)).encode()).digest()
            if mode == "aesv3":
                r = int(self.encrypt_rc4.get("r", 6))
                o, oe, u, ue, _key = make_encrypt_params_v5(
                    r, user_pw=user_pw,
                    owner_pw=owner_pw if owner_pw is not None else user_pw)
                enc_body = (
                    f"<< /Filter /Standard /V 5 /R {r} /Length 256 "
                    f"/CF << /StdCF << /CFM /AESV3 /Length 32 >> >> "
                    f"/StmF /StdCF /StrF /StdCF "
                    f"/O <{o.hex()}> /OE <{oe.hex()}> /U <{u.hex()}> /UE <{ue.hex()}> "
                    f"/P -44 >>"
                )
                enc_dict = {"Filter": "Standard", "V": 5, "R": r, "Length": 256,
                            "O": o, "OE": oe, "U": u, "UE": ue, "P": -44,
                            "CF": {"StdCF": {"CFM": "AESV3", "Length": 32}},
                            "StmF": "StdCF", "StrF": "StdCF"}
            elif mode == "aesv2":
                o, u, _key = make_encrypt_params(
                    4, 128, id0, user_pw=user_pw, owner_pw=owner_pw)
                enc_body = (
                    f"<< /Filter /Standard /V 4 /R 4 /Length 128 "
                    f"/CF << /StdCF << /CFM /AESV2 /Length 16 >> >> "
                    f"/StmF /StdCF /StrF /StdCF "
                    f"/O <{o.hex()}> /U <{u.hex()}> /P -44 >>"
                )
                enc_dict = {"Filter": "Standard", "V": 4, "R": 4, "Length": 128,
                            "O": o, "U": u, "P": -44,
                            "CF": {"StdCF": {"CFM": "AESV2", "Length": 16}},
                            "StmF": "StdCF", "StrF": "StdCF"}
            else:
                r = int(self.encrypt_rc4.get("r", 3))
                bits = int(self.encrypt_rc4.get("length", 128 if r >= 3 else 40))
                o, u, _key = make_encrypt_params(
                    r, bits, id0, user_pw=user_pw, owner_pw=owner_pw)
                v = 1 if bits == 40 else 2
                enc_body = (
                    f"<< /Filter /Standard /V {v} /R {r} /Length {bits} "
                    f"/O <{o.hex()}> /U <{u.hex()}> /P -44 >>"
                )
                enc_dict = {"Filter": "Standard", "V": v, "R": r, "Length": bits,
                            "O": o, "U": u, "P": -44}
            enc_id = self._add(enc_body.encode())
            handler = StandardSecurityHandler(enc_dict, id0, password=user_pw)
            # encrypt every stream payload under its per-object key (the
            # Encrypt dict itself and the xref stream stay plaintext).
            # RC4 preserves length; AES adds IV+padding, so /Length in
            # the stream dict is rewritten to the ciphertext size.
            import re as _re

            for num, body in enumerate(self.objects):
                if num == 0 or body is None or num == enc_id:
                    continue
                i = body.find(b"\nstream\n")
                if i < 0:
                    continue
                j = body.rfind(b"\nendstream")
                payload = handler.encrypt_bytes(num, 0, body[i + 8 : j])
                head = _re.sub(
                    rb"/Length \d+", b"/Length %d" % len(payload), body[:i], count=1
                )
                self.objects[num] = head + b"\nstream\n" + payload + body[j:]
            extra_trailer = (
                f" /Encrypt {enc_id} 0 R /ID [<{id0.hex()}> <{id0.hex()}>]"
            )

        out = bytearray(b"%PDF-1.5\n%\xe2\xe3\xcf\xd3\n" if self.xref_stream else b"%PDF-1.4\n")
        offsets: Dict[int, int] = {}
        for num, body in enumerate(self.objects):
            if num == 0 or body is None:
                continue
            offsets[num] = len(out)
            out += f"{num} 0 obj\n".encode() + body + b"\nendobj\n"

        if self.xref_stream:
            xref_id = len(self.objects)
            size = xref_id + 1
            rows = bytearray()
            # entry 0: free; W = [1 4 2]
            widths = (1, 4, 2)
            rows += bytes([0]) + (0).to_bytes(4, "big") + (65535).to_bytes(2, "big")
            for num in range(1, xref_id):
                if num in self._objstm_entries:
                    stm, idx = self._objstm_entries[num]
                    rows += bytes([2]) + stm.to_bytes(4, "big") + idx.to_bytes(2, "big")
                else:
                    off = offsets.get(num, 0)
                    rows += bytes([1]) + off.to_bytes(4, "big") + (0).to_bytes(2, "big")
            xref_off = len(out)
            rows += bytes([1]) + xref_off.to_bytes(4, "big") + (0).to_bytes(2, "big")
            data = zlib.compress(bytes(rows))
            head = (
                f"<< /Type /XRef /Size {size} /W [{widths[0]} {widths[1]} {widths[2]}] "
                f"/Root {catalog_id} 0 R{extra_trailer} /Filter /FlateDecode /Length {len(data)} >>"
            ).encode()
            out += f"{xref_id} 0 obj\n".encode() + head + b"\nstream\n" + data
            out += b"\nendstream\nendobj\n"
            out += f"startxref\n{xref_off}\n%%EOF\n".encode()
        else:
            xref_off = len(out)
            size = len(self.objects)
            out += f"xref\n0 {size}\n".encode()
            out += b"0000000000 65535 f \n"
            for num in range(1, size):
                out += f"{offsets[num]:010d} 00000 n \n".encode()
            out += (
                f"trailer\n<< /Size {size} /Root {catalog_id} 0 R{extra_trailer} >>\n"
                f"startxref\n{xref_off}\n%%EOF\n"
            ).encode()
        return bytes(out)

    # golden accessors -------------------------------------------------
    def golden_doc_text(self) -> str:
        return "\f".join(pb.golden_text() for pb in self.pages)

    def golden_whitetext(self, page: int = 0) -> str:
        return self.pages[page].golden_whitetext()


# ----------------------------------------------------------------------
# quote-PDF corpus (FIXTURES.md §2)
# ----------------------------------------------------------------------
METADATA_KEYS = [
    "Name_of_Prospect", "Address_of_Property", "Zip_Code",
    "Type_of_Property_Quote", "Purchase_Price", "Capital_Improvements_Amount",
    "Building_Value", "Know_Land_Value", "Date_of_Purchase", "CapEx_Date",
    "SqFt_Building", "Acres_Land", "Year_Built", "Bid_Amount_Original",
    "Pay_Upfront", "Pay_50_50_Amount", "Pay_Over_Time", "Rush_Fee",
    "Multiple_Properties_Quote", "First_Year_Bonus_Quote", "Tax_Year",
    "Tax_Deadline_Quote",
]

PROPERTY_TYPES = [
    "Industrial", "Medical", "Office", "Other", "Restaurant", "Retail",
    "Warehouse", "Multi Family", "Multi-Family", "Residential/LTR",
    "Short-Term Rental", "Unknown Type",
]


def quote_metadata_string(i: int) -> str:
    """Deterministic ||-delimited white-text payload for document i."""
    price = 100_000 + (i * 97_013) % 9_900_000
    land = round(price * (0.10 + (i % 7) * 0.02), 2)
    sqft = 1_000 + (i * 731) % 60_000
    acres = round(((i * 13) % 120) / 10.0, 1)
    year_built = 1960 + (i % 60)
    zipc = f"{(i * 601) % 100000:05d}" if i % 5 else f"{(i * 601) % 999}"  # short-zip fixture
    ptype = PROPERTY_TYPES[i % len(PROPERTY_TYPES)]
    bid = round(900 + (i * 37) % 12_000 + 0.5, 2)
    month = (i % 12) + 1
    day = (i % 27) + 1
    year = 2017 + (i % 9)
    date = f"{year:04d}-{month:02d}-{day:02d}" if i % 3 == 0 else f"{month:02d}/{day:02d}/{year:04d}"
    capex_date = "" if i % 4 == 0 else f"{month:02d}/{day:02d}/{year + 1:04d}"
    vals = {
        "Name_of_Prospect": f"Prospect {i} LLC",
        "Address_of_Property": f"{100 + i} Main St, Scottsdale, AZ",
        "Zip_Code": zipc,
        "Type_of_Property_Quote": ptype,
        "Purchase_Price": f"{price:,.2f}" if i % 2 else f"${price:,}",
        "Capital_Improvements_Amount": "0" if i % 3 else f"{(i % 5) * 50000}",
        "Building_Value": f"{price - land:,.0f}",
        "Know_Land_Value": f"{land:,.2f}",
        "Date_of_Purchase": date,
        "CapEx_Date": capex_date,
        "SqFt_Building": f"{sqft:,}",
        "Acres_Land": f"{acres}",
        "Year_Built": str(year_built),
        "Bid_Amount_Original": f"{bid:,.2f}",
        "Pay_Upfront": f"{round(bid * 0.91, 2):,.2f}",
        "Pay_50_50_Amount": f"{round(bid / 2, 2):,.2f}",
        "Pay_Over_Time": f"{round(bid / 4, 2):,.2f}",
        "Rush_Fee": ["0", "500", "1000"][i % 3],
        "Multiple_Properties_Quote": str(1 + i % 4),
        "First_Year_Bonus_Quote": f"{round(price * 0.3, 2):,.2f}",
        "Tax_Year": str(year + 2),
        "Tax_Deadline_Quote": ["October", "April", "June"][i % 3],
    }
    return "".join(f"||{k}: {vals[k]}" for k in METADATA_KEYS)


def make_quote_pdf(i: int) -> Tuple[bytes, str, str]:
    """Build quote PDF #i. Returns (pdf_bytes, golden_doc_text, golden_whitetext).

    Structural variant cycles through: uncompressed / flate / xref-stream /
    multi-page-with-metadata-on-page-2 / ToUnicode-font body /
    object-stream (ObjStm) layout / embedded-TrueType body (cmap
    format rotating 0→4-symbol→6, post names standard and custom) /
    embedded-Type1 body (built-in /Encoding) — the last two carry NO
    /ToUnicode, so their text decodes only through the font program.
    """
    variant = i % 8
    embedded = None
    if variant in (6, 7):
        embedded = {
            "tt_style": ("mac0", "sym4", "fmt6")[(i // 8) % 3],
            "tt_std_names": bool((i // 8) % 2),
            # variant 7's F4 body alternates the legacy Type1 program
            # and the modern bare-CFF (/FontFile3 /Type1C) shape
            "t1_flavor": ("type1", "cff")[(i // 8) % 2],
        }
    b = PdfBuilder(
        compress=variant in (1, 3, 5, 7),
        xref_stream=variant in (2, 5, 6),
        objstm=variant == 5,
        embedded_fonts=embedded,
    )
    meta = quote_metadata_string(i)

    p1 = b.new_page()
    p1.text(72, 720, f"RCG Valuation & Monetization Quote #{i}")
    p1.text_lines(
        72, 690,
        [f"Prepared for Prospect {i} LLC", "Cost Segregation Analysis", "Confidential"],
        style=["TD", "Tstar", "quote"][i % 3],
    )
    p1.tj(72, 640, ["Quote", -250, "Summary", -40, ":", -250, f"#{i}"])
    if variant == 4:
        p1.text(72, 610, f"Euro € and ﬁne ligature {i}", font="F2")
    elif variant == 6:
        p1.text(72, 610, f"Embedded TrueType € run #{i}", font="F3")
    elif variant == 7:
        p1.text(72, 610, f"Embedded Type1 € run #{i}", font="F4")

    whitetext_page = 0
    if variant == 3:  # metadata on page 2 of 3
        p2 = b.new_page()
        p2.text(72, 720, f"Schedule Detail {i}")
        p2.white_text(meta)
        whitetext_page = 1
        p3 = b.new_page()
        p3.text(72, 720, "Appendix")
    else:
        p1.white_text(meta)

    return b.build(), b.golden_doc_text(), b.golden_whitetext(whitetext_page)

"""Cross-reference table / stream walk and indirect-object loading.

Implements ISO 32000-1 §7.5: ``startxref`` discovery from the file
tail, classic xref tables (§7.5.4), xref streams (§7.5.8), the /Prev
trailer chain, hybrid-reference /XRefStm, object streams (/Type/ObjStm,
§7.5.7), and a brute-force reconstruction fallback for files with a
broken xref (counted as a decode fallback by the extraction stage).

This replaces the document-open path the reference delegates to pdf.js
(``getDocument`` at ``src/services/pdfParser/index.ts:23``).
"""

from __future__ import annotations

from typing import Any, Dict, Optional, Tuple

from .filters import decode_stream
from .lexer import (
    Keyword,
    LexError,
    Lexer,
    Name,
    Ref,
    StreamObj,
    parse_object_at,
)


class XrefError(ValueError):
    pass


class ObjectStore:
    """Resolves indirect references against a parsed xref map.

    ``entries`` maps object number → either
    ``('n', byte_offset)`` for regular objects, or
    ``('c', objstm_num, index)`` for objects compressed in object
    streams. Objects are parsed lazily and cached.
    """

    def __init__(self, data: bytes):
        self.data = data
        self.entries: Dict[int, tuple] = {}
        self.trailer: dict = {}
        self._cache: Dict[int, Any] = {}
        self._objstm_cache: Dict[int, list] = {}
        self.used_fallback = False
        self.crypt = None  # StandardSecurityHandler via attach_crypt()
        self._crypt_skip: set = set()
        self._build()

    def attach_crypt(self, handler, skip_nums=()) -> None:
        """Enable per-object RC4 decryption (ISO 32000-1 §7.6). Clears
        the object caches — anything loaded pre-attach was undecrypted.
        ``skip_nums``: object numbers left untouched (the /Encrypt
        dictionary itself — its /O and /U strings are plaintext)."""
        self.crypt = handler
        self._crypt_skip = set(skip_nums)
        self._cache.clear()
        self._objstm_cache.clear()

    # ------------------------------------------------------------------
    # xref construction
    # ------------------------------------------------------------------
    def _build(self) -> None:
        try:
            start = self._find_startxref()
            self._walk_xref_chain(start)
            if "Root" not in self.trailer:
                raise XrefError("trailer has no /Root")
        except (XrefError, LexError, ValueError, KeyError):
            self._reconstruct()
            self.used_fallback = True
        if "Root" not in self.trailer:
            raise XrefError("no document catalog found")

    def _find_startxref(self) -> int:
        tail = self.data[-2048:]
        idx = tail.rfind(b"startxref")
        if idx < 0:
            raise XrefError("startxref not found")
        lx = Lexer(tail, idx + len(b"startxref"))
        off = lx.read_object()
        if not isinstance(off, int) or off < 0 or off >= len(self.data):
            raise XrefError(f"bad startxref offset {off!r}")
        return off

    def _walk_xref_chain(self, offset: int) -> None:
        seen = set()
        pending: list = [offset]
        while pending:
            off = pending.pop(0)
            if off in seen or off < 0 or off >= len(self.data):
                continue
            seen.add(off)
            lx = Lexer(self.data, off)
            lx.skip_ws()
            if self.data[lx.pos : lx.pos + 4] == b"xref":
                trailer = self._parse_xref_table(lx)
            else:
                trailer = self._parse_xref_stream(off)
            # first-seen trailer keys win (newest-to-oldest walk)
            for k, v in trailer.items():
                self.trailer.setdefault(k, v)
            for key in ("XRefStm", "Prev"):
                nxt = trailer.get(key)
                if isinstance(nxt, int):
                    pending.append(nxt)

    def _parse_xref_table(self, lx: Lexer) -> dict:
        lx.expect_keyword(b"xref")
        while True:
            lx.skip_ws()
            if self.data[lx.pos : lx.pos + 7] == b"trailer":
                lx.pos += 7
                trailer = lx.read_object()
                if not isinstance(trailer, dict):
                    raise XrefError("trailer is not a dict")
                return trailer
            first = lx.read_number()
            lx.skip_ws()
            count = lx.read_number()
            if not isinstance(first, int) or not isinstance(count, int):
                raise XrefError("bad xref subsection header")
            for i in range(count):
                # entries: 10-digit offset, 5-digit gen, n/f keyword —
                # nominally 20 bytes incl. EOL; parsed tolerantly
                lx.skip_ws()
                off = lx.read_number()
                lx.skip_ws()
                gen = lx.read_number()  # noqa: F841 — gen unused, entries keyed by num
                lx.skip_ws()
                kind = self.data[lx.pos : lx.pos + 1]
                lx.pos += 1
                if kind not in (b"n", b"f"):
                    raise XrefError(f"bad xref entry kind {kind!r}")
                num = first + i
                if kind == b"n" and num not in self.entries:
                    self.entries[num] = ("n", int(off))
            lx.skip_ws()

    def _parse_xref_stream(self, offset: int) -> dict:
        num, gen, obj = parse_object_at(self.data, offset)
        if not isinstance(obj, StreamObj) or str(obj.dict.get("Type")) != "XRef":
            raise XrefError("expected xref stream")
        data = decode_stream(obj)
        w = obj.dict.get("W")
        size = obj.dict.get("Size")
        if not isinstance(w, list) or len(w) < 3:
            raise XrefError("xref stream missing /W")
        w = [int(x) for x in w]
        index = obj.dict.get("Index") or [0, int(size)]
        row_len = sum(w)
        pos = 0
        pairs = [(int(index[i]), int(index[i + 1])) for i in range(0, len(index), 2)]
        for first, count in pairs:
            for i in range(count):
                row = data[pos : pos + row_len]
                if len(row) < row_len:
                    raise XrefError("truncated xref stream")
                pos += row_len
                fields = []
                fp = 0
                for width in w:
                    if width == 0:
                        fields.append(1 if len(fields) == 0 else 0)
                    else:
                        fields.append(int.from_bytes(row[fp : fp + width], "big"))
                        fp += width
                ftype, f2, f3 = fields[0], fields[1], fields[2]
                objnum = first + i
                if objnum in self.entries:
                    continue
                if ftype == 1:
                    self.entries[objnum] = ("n", f2)
                elif ftype == 2:
                    self.entries[objnum] = ("c", f2, f3)
                # ftype 0: free — skip
        return dict(obj.dict)

    def _reconstruct(self) -> None:
        """Brute-force scan for ``N G obj`` markers (fallback path)."""
        import re

        self.entries.clear()
        for m in re.finditer(rb"(\d+)\s+(\d+)\s+obj\b", self.data):
            num = int(m.group(1))
            self.entries[num] = ("n", m.start())  # last occurrence wins
        # find a trailer dict or a catalog object
        idx = self.data.rfind(b"trailer")
        trailer: dict = {}
        if idx >= 0:
            try:
                lx = Lexer(self.data, idx + 7)
                t = lx.read_object()
                if isinstance(t, dict):
                    trailer = t
            except LexError:
                pass
        if "Root" not in trailer:
            for num in sorted(self.entries):
                try:
                    obj = self.get_object(num)
                except Exception:
                    continue
                d = obj.dict if isinstance(obj, StreamObj) else obj
                if isinstance(d, dict) and str(d.get("Type")) == "Catalog":
                    trailer["Root"] = Ref(num, 0)
                    break
        self.trailer = trailer

    # ------------------------------------------------------------------
    # object access
    # ------------------------------------------------------------------
    def resolve(self, obj: Any) -> Any:
        """Resolve an object, following Ref chains."""
        depth = 0
        while isinstance(obj, Ref):
            obj = self.get_object(obj.num)
            depth += 1
            if depth > 32:
                raise XrefError("reference cycle")
        return obj

    def get_object(self, num: int) -> Any:
        if num in self._cache:
            return self._cache[num]
        entry = self.entries.get(num)
        if entry is None:
            return None
        if entry[0] == "n":
            try:
                onum, ogen, val = parse_object_at(self.data, entry[1])
            except LexError as e:
                raise XrefError(f"object {num} unparseable: {e}") from None
            if onum != num:
                # stale offset: fall back to scan (gen comes from the
                # RECOVERED object — decrypting with the mismatched
                # object's gen would derive the wrong per-object key)
                ogen, val = self._scan_for_object(num)
            if isinstance(val, StreamObj):
                length = val.dict.get("Length")
                if isinstance(length, Ref):
                    real = self.resolve(length)
                    if isinstance(real, int):
                        val = StreamObj(val.dict, val.raw[:real])
            if self.crypt is not None and num not in self._crypt_skip:
                # §7.6.2: streams and strings of directly-stored objects
                # are RC4-encrypted under the per-object key. Objects
                # inside ObjStm are NOT individually encrypted (the
                # container stream was) — hence only this 'n' branch.
                val = _decrypt_object(val, num, ogen, self.crypt)
        else:  # compressed in object stream
            val = self._get_from_objstm(entry[1], entry[2])
        self._cache[num] = val
        return val

    def _scan_for_object(self, num: int) -> Tuple[int, Any]:
        """→ (gen, value) of the recovered object."""
        import re

        pat = re.compile(rb"\b" + str(num).encode() + rb"\s+\d+\s+obj\b")
        for m in pat.finditer(self.data):
            try:
                onum, ogen, val = parse_object_at(self.data, m.start())
                if onum == num:
                    return ogen, val
            except LexError:
                continue
        raise XrefError(f"object {num} not found by scan")

    def _get_from_objstm(self, stm_num: int, idx: int) -> Any:
        objs = self._objstm_cache.get(stm_num)
        if objs is None:
            stm = self.get_object(stm_num)
            if not isinstance(stm, StreamObj) or str(stm.dict.get("Type")) != "ObjStm":
                raise XrefError(f"object stream {stm_num} invalid")
            data = decode_stream(stm, self.resolve)
            n = int(self.resolve(stm.dict.get("N")))
            first = int(self.resolve(stm.dict.get("First")))
            hdr = Lexer(data)
            pairs = []
            for _ in range(n):
                hdr.skip_ws()
                onum = hdr.read_number()
                hdr.skip_ws()
                ooff = hdr.read_number()
                pairs.append((int(onum), int(ooff)))
            objs = []
            for onum, ooff in pairs:
                lx = Lexer(data, first + ooff)
                objs.append((onum, lx.read_object()))
            self._objstm_cache[stm_num] = objs
        if idx >= len(objs):
            raise XrefError(f"objstm index {idx} out of range")
        return objs[idx][1]

    def catalog(self) -> dict:
        root = self.resolve(self.trailer.get("Root"))
        if not isinstance(root, dict):
            raise XrefError("catalog missing")
        return root


def _decrypt_object(obj: Any, num: int, gen: int, crypt) -> Any:
    """Recursively decrypt the strings (bytes) and stream body of one
    directly-stored object under its per-object RC4 key."""
    if isinstance(obj, bytes):
        return crypt.decrypt(num, gen, obj)
    if isinstance(obj, list):
        return [_decrypt_object(x, num, gen, crypt) for x in obj]
    if isinstance(obj, dict):
        return {k: _decrypt_object(v, num, gen, crypt) for k, v in obj.items()}
    if isinstance(obj, StreamObj):
        return StreamObj(
            _decrypt_object(obj.dict, num, gen, crypt),
            crypt.decrypt(num, gen, obj.raw),
        )
    return obj

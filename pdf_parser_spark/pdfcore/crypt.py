"""ISO 32000-1 §7.6 standard security handler (RC4-40/128, empty user
password) — pure stdlib.

The reference relies on vendored pdf.js for this (its worker decrypts
RC4/AES transparently); crawled corpora routinely contain PDFs that are
"encrypted" with an EMPTY user password (owner-restricted printing
etc.), whose text a crawler should still extract. This implements:

- Algorithm 2 (compute encryption key from the padded password, /O,
  /P, ID[0]; 50×MD5 strengthening for R≥3),
- Algorithms 4/5 (verify the empty USER password against /U),
- per-object RC4 keys (MD5 of key + objnum[3] + gen[2], §7.6.2).

Scope: /Filter Standard, V 1-2, R 2-3 (RC4 40..128 bit). V≥4 (AES,
crypt filters) and non-empty passwords raise :class:`CryptError` so
callers keep the typed ``encrypted`` row. RC4 itself is the textbook
KSA+PRGA — fine at these key sizes for DEcryption of legacy documents
(this module never encrypts anything new).
"""

from __future__ import annotations

import hashlib
import struct
from typing import Optional

__all__ = ["CryptError", "StandardSecurityHandler", "rc4"]

# §7.6.3.3 Algorithm 2 step (a): the 32-byte password padding constant
_PAD = bytes(
    [
        0x28, 0xBF, 0x4E, 0x5E, 0x4E, 0x75, 0x8A, 0x41,
        0x64, 0x00, 0x4E, 0x56, 0xFF, 0xFA, 0x01, 0x08,
        0x2E, 0x2E, 0x00, 0xB6, 0xD0, 0x68, 0x3E, 0x80,
        0x2F, 0x0C, 0xA9, 0xFE, 0x64, 0x53, 0x69, 0x7A,
    ]
)


class CryptError(ValueError):
    def __init__(self, code: str, msg: str):
        super().__init__(msg)
        self.code = code


def rc4(key: bytes, data: bytes) -> bytes:
    """Textbook RC4 (KSA + PRGA)."""
    S = list(range(256))
    j = 0
    klen = len(key)
    for i in range(256):
        j = (j + S[i] + key[i % klen]) & 0xFF
        S[i], S[j] = S[j], S[i]
    out = bytearray(len(data))
    i = j = 0
    for n, byte in enumerate(data):
        i = (i + 1) & 0xFF
        j = (j + S[i]) & 0xFF
        S[i], S[j] = S[j], S[i]
        out[n] = byte ^ S[(S[i] + S[j]) & 0xFF]
    return bytes(out)


def _as_bytes(v) -> bytes:
    if isinstance(v, bytes):
        return v
    if isinstance(v, str):
        return v.encode("latin-1")
    raise CryptError("encrypt_dict", f"expected string in /Encrypt, got {type(v).__name__}")


class StandardSecurityHandler:
    """Validated handler for one document; raises CryptError('password')
    if the EMPTY user password does not open the document."""

    def __init__(self, encrypt: dict, file_id0: bytes):
        filt = str(encrypt.get("Filter", ""))
        if filt != "Standard":
            raise CryptError("filter", f"unsupported security handler {filt!r}")
        v = int(encrypt.get("V", 0))
        r = int(encrypt.get("R", 0))
        if v not in (1, 2) or r not in (2, 3):
            raise CryptError(
                "cipher", f"only RC4 V1/V2 R2/R3 supported (V={v} R={r}; AES needs V>=4)"
            )
        self.v, self.r = v, r
        length_bits = int(encrypt.get("Length", 40)) if v == 2 else 40
        if length_bits % 8 or not (40 <= length_bits <= 128):
            raise CryptError("length", f"bad key length {length_bits}")
        self.n = length_bits // 8
        self.o = _as_bytes(encrypt.get("O"))
        self.u = _as_bytes(encrypt.get("U"))
        if len(self.o) < 32 or len(self.u) < 32:
            raise CryptError("encrypt_dict", "/O and /U must be 32 bytes")
        # /P is a SIGNED 32-bit flags value, fed to MD5 little-endian
        self.p = int(encrypt.get("P", 0))
        self.id0 = file_id0
        self.key = self._compute_key(b"")  # empty USER password
        if not self._check_user_password():
            raise CryptError("password", "document requires a non-empty user password")

    # Algorithm 2
    def _compute_key(self, password: bytes) -> bytes:
        padded = (password + _PAD)[:32]
        md = hashlib.md5()
        md.update(padded)
        md.update(self.o[:32])
        md.update(struct.pack("<i", self.p if self.p < 2**31 else self.p - 2**32))
        md.update(self.id0)
        digest = md.digest()
        if self.r >= 3:
            for _ in range(50):
                digest = hashlib.md5(digest[: self.n]).digest()
        return digest[: self.n]

    # Algorithms 4 (R2) / 5 (R3)
    def _check_user_password(self) -> bool:
        if self.r == 2:
            return rc4(self.key, _PAD) == self.u[:32]
        md = hashlib.md5()
        md.update(_PAD)
        md.update(self.id0)
        val = rc4(self.key, md.digest())
        for i in range(1, 20):
            step_key = bytes(b ^ i for b in self.key)
            val = rc4(step_key, val)
        return val == self.u[:16]

    # §7.6.2 Algorithm 1: per-object key
    def object_key(self, num: int, gen: int) -> bytes:
        md = hashlib.md5()
        md.update(self.key)
        md.update(struct.pack("<I", num & 0xFFFFFF)[:3])
        md.update(struct.pack("<I", gen & 0xFFFF)[:2])
        return md.digest()[: min(self.n + 5, 16)]

    def decrypt(self, num: int, gen: int, data: bytes) -> bytes:
        return rc4(self.object_key(num, gen), data)

    # encryption is the same RC4 keystream (used only to synthesize
    # test fixtures — never to protect anything)
    encrypt = decrypt


def build_handler(encrypt: dict, file_id) -> Optional[StandardSecurityHandler]:
    """Encrypt dict + trailer /ID → handler (CryptError on anything
    outside the supported RC4/empty-password envelope)."""
    id0 = b""
    if isinstance(file_id, list) and file_id:
        first = file_id[0]
        if isinstance(first, (bytes, str)):
            id0 = _as_bytes(first)
    return StandardSecurityHandler(encrypt, id0)


# ----------------------------------------------------------------------
# fixture synthesis (tests only — nothing here protects anything)
# ----------------------------------------------------------------------
def make_encrypt_params(r: int, length_bits: int, id0: bytes, p: int = -44):
    """(O, U, file_key) for EMPTY owner+user passwords — used by the
    test PDF generator to synthesize standard-handler documents.

    O is Algorithm 3, U Algorithms 4/5, file_key Algorithm 2 — the same
    public ISO 32000-1 algorithms the decoder implements (a shared
    key-derivation bug would cancel in the round trip; the tests
    therefore also assert ciphertext != plaintext and byte-identical
    text vs generator goldens computed without this module)."""
    n = length_bits // 8
    # Algorithm 3: /O from the (empty) owner password
    d = hashlib.md5(_PAD).digest()
    if r >= 3:
        for _ in range(50):
            d = hashlib.md5(d).digest()
    okey = d[:n]
    o = rc4(okey, _PAD)
    if r >= 3:
        for i in range(1, 20):
            o = rc4(bytes(b ^ i for b in okey), o)
    # Algorithm 2: file key from the (empty) user password + /O + /P + ID
    md = hashlib.md5()
    md.update(_PAD)
    md.update(o)
    md.update(struct.pack("<i", p))
    md.update(id0)
    key = md.digest()
    if r >= 3:
        for _ in range(50):
            key = hashlib.md5(key[:n]).digest()
    key = key[:n]
    # Algorithms 4/5: /U
    if r == 2:
        u = rc4(key, _PAD)
    else:
        val = rc4(key, hashlib.md5(_PAD + id0).digest())
        for i in range(1, 20):
            val = rc4(bytes(b ^ i for b in key), val)
        u = val + b"\x00" * 16
    return o, u, key

"""Property-based codec round trips (hypothesis) — the generative form
of the example tests in test_{png,jpeg,gif}core.py and the crypt suite.

All Spark-free pure-Python kernels, so thousands of cases are cheap.
Invariants:

- PNG: encode→decode is the identity for ANY pixels/dims/filter/
  color-type, progressive AND Adam7-interlaced layouts;
- JPEG: progressive and baseline files of the same pixels decode
  IDENTICALLY for any content/dims/quant (shared-coefficient
  invariant — scan-logic bugs cannot hide), and unit-quant decode is
  within ±1 of the source;
- GIF: encode→decode is the identity through the palette for any
  indices/dims/palette-size/interlace;
- crypt: RC4 and AES object encryption round-trip for any payload and
  object id across every supported cipher config.
"""

from __future__ import annotations

import numpy as np
from hypothesis import given, settings, strategies as st

dims = st.tuples(st.integers(1, 24), st.integers(1, 20))


@settings(max_examples=60, deadline=None)
@given(
    wh=dims,
    color_type=st.sampled_from([0, 2, 4, 6]),
    filter_type=st.integers(0, 4),
    interlace=st.booleans(),
    seed=st.integers(0, 2**31),
)
def test_png_roundtrip_property(wh, color_type, filter_type, interlace, seed):
    from pdf_parser_spark.pngcore import _CHANNELS, decode_png, encode_png

    w, h = wh
    ch = _CHANNELS[color_type]
    rng = np.random.default_rng(seed)
    px = rng.integers(0, 256, size=w * h * ch, dtype=np.uint8).tobytes()
    blob = encode_png(w, h, px, color_type=color_type,
                      filter_type=filter_type, interlace=interlace)
    img = decode_png(blob)
    assert (img["width"], img["height"]) == (w, h)
    assert img["pixels"] == px


@settings(max_examples=40, deadline=None)
@given(
    wh=dims,
    channels=st.sampled_from([1, 3]),
    qstep=st.sampled_from([1, 2, 16]),
    seed=st.integers(0, 2**31),
)
def test_jpeg_progressive_equals_baseline_property(wh, channels, qstep, seed):
    from pdf_parser_spark.jpegcore import (
        decode_jpeg, encode_jpeg, encode_jpeg_progressive)

    w, h = wh
    rng = np.random.default_rng(seed)
    px = rng.integers(0, 256, size=w * h * channels, dtype=np.uint8).tobytes()
    q = [qstep] * 64
    base = decode_jpeg(encode_jpeg(w, h, px, channels=channels,
                                   quant_luma=q, quant_chroma=q))
    prog = decode_jpeg(encode_jpeg_progressive(w, h, px, channels=channels,
                                               quant_luma=q, quant_chroma=q))
    assert prog["pixels"] == base["pixels"]
    if qstep == 1 and channels == 1:
        got = np.frombuffer(base["pixels"], dtype=np.uint8).astype(int)
        want = np.frombuffer(px, dtype=np.uint8).astype(int)
        assert np.max(np.abs(got - want)) <= 1  # float .5 ties only


@settings(max_examples=60, deadline=None)
@given(
    wh=dims,
    depth=st.sampled_from([2, 4, 8]),
    interlace=st.booleans(),
    seed=st.integers(0, 2**31),
)
def test_gif_roundtrip_property(wh, depth, interlace, seed):
    from pdf_parser_spark.gifcore import decode_gif, encode_gif

    w, h = wh
    n = 1 << depth
    rng = np.random.default_rng(seed)
    palette = rng.integers(0, 256, size=3 * n, dtype=np.uint8).tobytes()
    idx = rng.integers(0, n, size=w * h, dtype=np.uint8).tobytes()
    blob = encode_gif(w, h, idx, palette, interlace=interlace)
    img = decode_gif(blob)
    want = b"".join(palette[3 * i : 3 * i + 3] for i in idx)
    assert img["pixels"] == want


@settings(max_examples=40, deadline=None)
@given(
    payload=st.binary(min_size=0, max_size=300),
    num=st.integers(1, 0xFFFFFF),
    gen=st.integers(0, 0xFFFF),
    cfg=st.sampled_from(["rc4-2-40", "rc4-3-128", "aesv2", "aesv3-5", "aesv3-6"]),
)
def test_crypt_object_roundtrip_property(payload, num, gen, cfg):
    from pdf_parser_spark.pdfcore.crypt import (
        StandardSecurityHandler, make_encrypt_params, make_encrypt_params_v5)

    if cfg.startswith("rc4"):
        _, r, bits = cfg.split("-")
        o, u, _ = make_encrypt_params(int(r), int(bits), b"prop-id")
        enc = {"Filter": "Standard", "V": 1 if bits == "40" else 2, "R": int(r),
               "Length": int(bits), "O": o, "U": u, "P": -44}
        h = StandardSecurityHandler(enc, b"prop-id")
    elif cfg == "aesv2":
        o, u, _ = make_encrypt_params(4, 128, b"prop-id")
        enc = {"Filter": "Standard", "V": 4, "R": 4, "Length": 128, "O": o,
               "U": u, "P": -44, "CF": {"StdCF": {"CFM": "AESV2", "Length": 16}},
               "StmF": "StdCF", "StrF": "StdCF"}
        h = StandardSecurityHandler(enc, b"prop-id")
    else:
        r = int(cfg.split("-")[1])
        o, oe, u, ue, _ = make_encrypt_params_v5(r)
        enc = {"Filter": "Standard", "V": 5, "R": r, "Length": 256,
               "O": o, "OE": oe, "U": u, "UE": ue, "P": -44,
               "CF": {"StdCF": {"CFM": "AESV3", "Length": 32}},
               "StmF": "StdCF", "StrF": "StdCF"}
        h = StandardSecurityHandler(enc, b"")
    ct = h.encrypt_bytes(num, gen, payload)
    assert h.decrypt(num, gen, ct) == payload
    if payload:
        assert ct != payload

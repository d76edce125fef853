"""Pure-stdlib GIF codec: LSB-first LZW, palettes, interlace, typed
errors, and the multimodal integration."""

from __future__ import annotations

import pytest

from pdf_parser_spark import multimodal as mm
from pdf_parser_spark.gifcore import (
    GifError,
    decode_gif,
    encode_gif,
    parse_gif_header,
)

PAL4 = bytes([255, 0, 0, 0, 255, 0, 0, 0, 255, 9, 9, 9])  # 4 RGB entries


def _indices(w, h, n):
    return bytes(((x * 3 + y * 5) % n) for y in range(h) for x in range(w))


def test_roundtrip_plain():
    for w, h in [(4, 3), (8, 8), (13, 7), (1, 1)]:
        idx = _indices(w, h, 4)
        blob = encode_gif(w, h, idx, PAL4)
        img = decode_gif(blob)
        assert (img["width"], img["height"], img["channels"]) == (w, h, 3)
        assert img["n_frames"] == 1
        want = b"".join(PAL4[3 * i : 3 * i + 3] for i in idx)
        assert img["pixels"] == want


def test_roundtrip_interlaced():
    w, h = 10, 9
    idx = _indices(w, h, 4)
    blob = encode_gif(w, h, idx, PAL4, interlace=True)
    assert decode_gif(blob)["pixels"] == decode_gif(encode_gif(w, h, idx, PAL4))["pixels"]


def test_256_color_palette():
    pal = bytes(range(256)) * 3  # 256 entries, channel-planar-ish but valid bytes
    pal = bytes(b for i in range(256) for b in (i, 255 - i, i // 2))
    idx = bytes(range(256))[:64]
    blob = encode_gif(8, 8, idx, pal)
    img = decode_gif(blob)
    assert img["pixels"][:3] == pal[0:3]
    assert img["pixels"][3:6] == pal[3:6]


def test_header_and_typed_errors():
    blob = encode_gif(5, 4, bytes(20), PAL4)
    assert parse_gif_header(blob) == {"width": 5, "height": 4, "channels": 3}
    with pytest.raises(GifError) as ei:
        decode_gif(b"NOTGIF00")
    assert ei.value.code == "not_gif"
    with pytest.raises(GifError) as ei:
        decode_gif(blob[:20])  # cut mid-stream
    assert ei.value.code in ("truncated", "corrupt", "no_image")
    # corrupt LZW: an immediate out-of-table code (7 with an empty
    # dictionary at width 3) must be a typed error, not garbage
    from pdf_parser_spark.gifcore import _lzw_decode_gif

    with pytest.raises(GifError) as ei:
        _lzw_decode_gif(2, b"\x07", max_pixels=100)
    assert ei.value.code == "lzw"
    # bad minimum code size in-file
    sized = bytearray(blob)
    lzw_at = 6 + 7 + 12 + 10  # header + LSD + GCT(4*3) + image descriptor
    assert sized[lzw_at] == 2
    sized[lzw_at] = 1
    with pytest.raises(GifError) as ei:
        decode_gif(bytes(sized))
    assert ei.value.code == "lzw"


def test_multimodal_integration(spark):
    idx = _indices(6, 4, 4)
    blob = encode_gif(6, 4, idx, PAL4)
    meta = mm.decode_media(blob)
    assert meta["kind"] == "image"
    assert (meta["width"], meta["height"], meta["channels"]) == (6, 4, 3)
    thumb = mm.resize_image(blob, 2, 2)  # GIF in → PNG thumb out
    from pdf_parser_spark.pngcore import decode_png

    assert mm.thumb_pixel_sum(thumb) == sum(decode_png(thumb)["pixels"])
    df = spark.createDataFrame([(1, blob)], "doc_id long, media binary")
    row = mm.media_metadata(df).collect()[0]
    assert row["kind"] == "image" and row["error"] is None

"""Stdlib image codec: PNG/BMP roundtrips + multimodal real-decode path.

The r4 verdict asked for a real image decode kernel ("stdlib-only
decoder (e.g. uncompressed BMP/PNG via zlib)") so media_features
oracles real bytes end-to-end. These tests pin pixel-exact roundtrips
across every PNG filter type and color depth we claim, BMP row
order/padding, and the multimodal kernel's decoded-pixel features.
"""

import numpy as np
import pytest

from myaku_spark.functions.imagecodec import (
    decode_bmp,
    decode_image,
    decode_png,
    encode_bmp,
    encode_png,
    resize_nearest,
    sniff,
)


def _raster(h, w, c, seed=0):
    rng = np.random.default_rng(seed)
    return rng.integers(0, 256, size=(h, w, c), dtype=np.uint8)


@pytest.mark.parametrize("filter_type", [0, 1, 2, 3, 4])
@pytest.mark.parametrize("channels", [1, 2, 3, 4])
def test_png_roundtrip_all_filters_and_depths(filter_type, channels):
    a = _raster(11, 7, channels, seed=filter_type * 10 + channels)
    data = encode_png(a, filter_type=filter_type)
    assert sniff(data) == "png"
    out = decode_png(data)
    assert out.shape == a.shape
    assert np.array_equal(out, a)


def test_png_rejects_unsupported():
    with pytest.raises(ValueError):
        decode_png(b"nope")
    # 16-bit depth is out of scope and must be a clean error.
    import struct
    import zlib

    from myaku_spark.functions.imagecodec import PNG_SIG, _chunk

    ihdr = struct.pack(">IIBBBBB", 2, 2, 16, 0, 0, 0, 0)
    data = (
        PNG_SIG
        + _chunk(b"IHDR", ihdr)
        + _chunk(b"IDAT", zlib.compress(b"\x00" * 10))
        + _chunk(b"IEND", b"")
    )
    with pytest.raises(ValueError, match="bit depth"):
        decode_png(data)


def test_bmp_roundtrip_with_padding():
    # w=7 → stride 21 → 3 pad bytes per row: exercises the 4-byte
    # alignment and the BGR/bottom-up conventions.
    a = _raster(5, 7, 3, seed=3)
    data = encode_bmp(a)
    assert sniff(data) == "bmp"
    out = decode_bmp(data)
    assert np.array_equal(out, a)


def test_bmp_top_down_rows():
    a = _raster(4, 4, 3, seed=4)
    data = bytearray(encode_bmp(a))
    # Flip the height sign to declare top-down, and reorder rows to
    # match (encoder wrote bottom-up).
    import struct

    (pixel_off,) = struct.unpack("<I", bytes(data[10:14]))
    h = 4
    stride = (4 * 3 + 3) & ~3
    rows = [
        bytes(data[pixel_off + i * stride : pixel_off + (i + 1) * stride])
        for i in range(h)
    ]
    data[14 + 4 : 14 + 12] = struct.pack("<ii", 4, -4)
    flat = b"".join(reversed(rows))
    data[pixel_off:] = flat
    out = decode_bmp(bytes(data))
    assert np.array_equal(out, a)


def test_decode_image_sniffs_and_rejects():
    a = _raster(3, 3, 3, seed=5)
    assert np.array_equal(decode_image(encode_png(a)), a)
    assert np.array_equal(decode_image(encode_bmp(a)), a)
    with pytest.raises(ValueError, match="unknown image container"):
        decode_image(b"\x00\x01\x02garbage")


def test_resize_nearest_exact_dims_and_identity():
    a = _raster(8, 6, 3, seed=6)
    r = resize_nearest(a, 3, 4)
    assert r.shape == (4, 3, 3)
    assert np.array_equal(resize_nearest(a, 6, 8), a)  # same-size = id
    # Upscale 2x: every source pixel replicated in a 2x2 block.
    up = resize_nearest(a, 12, 16)
    assert np.array_equal(up[::2, ::2], a)


def test_multimodal_real_decode_features():
    # The image feature is a projection of DECODED pixels: two different
    # containers (PNG vs BMP) of the SAME raster must produce the SAME
    # feature, which the raw-byte stub could never do.
    from myaku_spark.operators.multimodal import _default_decode

    a = _raster(10, 9, 3, seed=7)
    f_png = _default_decode(encode_png(a), "image")
    f_bmp = _default_decode(encode_bmp(a), "image")
    assert np.allclose(f_png, f_bmp)
    assert len(f_png) == 64 and abs(float(np.linalg.norm(f_png)) - 1) < 1e-6
    # Audio stays on the declared stub; unknown kinds still raise.
    assert len(_default_decode(b"\x01\x02\x03", "audio")) == 64
    with pytest.raises(NotImplementedError):
        _default_decode(b"x", "hologram")
    # A non-image payload under kind=image is a loud error, not silence.
    with pytest.raises(ValueError):
        _default_decode(b"not an image", "image")

"""Pure-stdlib image codec: PNG (zlib) + uncompressed BMP.

Replaces the multimodal decode STUB for images (r4 verdict #6) without
any external imaging library: the container/environment has no PIL or
ffmpeg, but PNG is just zlib + per-scanline byte filters and 24-bit BMP
is a padded raster — both fully decodable with ``zlib``/``struct`` +
numpy. The decoded raster (H, W, C) uint8 array feeds the multimodal
feature kernel and the real nearest-neighbor resize.

Supported surface (validated, everything else raises ValueError so the
multimodal boundary stays explicit):

- PNG: 8-bit depth, color types 0 (gray), 2 (RGB), 4 (gray+alpha),
  6 (RGBA); all five scanline filters (None/Sub/Up/Average/Paeth);
  non-interlaced only. Encoder emits any fixed filter type per image
  (tests roundtrip the decoder against every filter path).
- BMP: BITMAPINFOHEADER, 24-bit, BI_RGB (uncompressed), bottom-up or
  top-down rows, 4-byte row padding.
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

PNG_SIG = b"\x89PNG\r\n\x1a\n"

_PNG_CHANNELS = {0: 1, 2: 3, 4: 2, 6: 4}


def sniff(data: bytes) -> str | None:
    """'png' | 'bmp' | None for a payload's container format."""
    if data[:8] == PNG_SIG:
        return "png"
    if data[:2] == b"BM":
        return "bmp"
    return None


# --- PNG ---------------------------------------------------------------------


def _chunk(tag: bytes, body: bytes) -> bytes:
    return (
        struct.pack(">I", len(body))
        + tag
        + body
        + struct.pack(">I", zlib.crc32(tag + body) & 0xFFFFFFFF)
    )


def encode_png(arr: np.ndarray, filter_type: int = 0) -> bytes:
    """(H, W) or (H, W, C) uint8 → PNG bytes, one fixed scanline filter
    (0-4; encoders may pick any per row — ours uses one for testability:
    the decoder must invert all five)."""
    a = np.asarray(arr, dtype=np.uint8)
    if a.ndim == 2:
        a = a[:, :, None]
    h, w, c = a.shape
    color_type = {1: 0, 2: 4, 3: 2, 4: 6}[c]
    if filter_type not in range(5):
        raise ValueError(f"bad filter type {filter_type}")
    raw = bytearray()
    prev = np.zeros((w, c), dtype=np.uint8)
    for y in range(h):
        row = a[y]
        if filter_type == 0:
            filt = row
        elif filter_type == 1:  # Sub
            left = np.vstack([np.zeros((1, c), np.uint8), row[:-1]])
            filt = (row.astype(np.int16) - left.astype(np.int16)) % 256
        elif filter_type == 2:  # Up
            filt = (row.astype(np.int16) - prev.astype(np.int16)) % 256
        elif filter_type == 3:  # Average
            left = np.vstack([np.zeros((1, c), np.uint8), row[:-1]])
            avg = (left.astype(np.int16) + prev.astype(np.int16)) // 2
            filt = (row.astype(np.int16) - avg) % 256
        else:  # Paeth
            left = np.vstack([np.zeros((1, c), np.uint8), row[:-1]])
            ul = np.vstack([np.zeros((1, c), np.uint8), prev[:-1]])
            filt = (
                row.astype(np.int16)
                - _paeth(
                    left.astype(np.int16),
                    prev.astype(np.int16),
                    ul.astype(np.int16),
                )
            ) % 256
        raw.append(filter_type)
        raw.extend(filt.astype(np.uint8).tobytes())
        prev = row
    ihdr = struct.pack(">IIBBBBB", w, h, 8, color_type, 0, 0, 0)
    return (
        PNG_SIG
        + _chunk(b"IHDR", ihdr)
        + _chunk(b"IDAT", zlib.compress(bytes(raw), 6))
        + _chunk(b"IEND", b"")
    )


def _paeth(a: np.ndarray, b: np.ndarray, c: np.ndarray) -> np.ndarray:
    """Paeth predictor, vectorized over a scanline (RFC 2083 §6.6)."""
    p = a + b - c
    pa, pb, pc = np.abs(p - a), np.abs(p - b), np.abs(p - c)
    return np.where(
        (pa <= pb) & (pa <= pc), a, np.where(pb <= pc, b, c)
    )


def decode_png(data: bytes) -> np.ndarray:
    """PNG bytes → (H, W, C) uint8 raster."""
    if data[:8] != PNG_SIG:
        raise ValueError("not a PNG (bad signature)")
    pos = 8
    w = h = None
    color_type = bit_depth = interlace = None
    idat = bytearray()
    while pos + 8 <= len(data):
        (ln,) = struct.unpack(">I", data[pos : pos + 4])
        tag = data[pos + 4 : pos + 8]
        body = data[pos + 8 : pos + 8 + ln]
        if len(body) != ln:
            raise ValueError("truncated PNG chunk")
        pos += 12 + ln  # len + tag + body + crc
        if tag == b"IHDR":
            w, h, bit_depth, color_type, _comp, _filt, interlace = (
                struct.unpack(">IIBBBBB", body)
            )
        elif tag == b"IDAT":
            idat.extend(body)
        elif tag == b"IEND":
            break
    if w is None:
        raise ValueError("PNG missing IHDR")
    if bit_depth != 8:
        raise ValueError(f"unsupported PNG bit depth {bit_depth}")
    if color_type not in _PNG_CHANNELS:
        raise ValueError(f"unsupported PNG color type {color_type}")
    if interlace:
        raise ValueError("interlaced PNG unsupported")
    c = _PNG_CHANNELS[color_type]
    raw = zlib.decompress(bytes(idat))
    stride = w * c
    if len(raw) != h * (stride + 1):
        raise ValueError("PNG pixel data size mismatch")
    out = np.zeros((h, w, c), dtype=np.uint8)
    prev = np.zeros(stride, dtype=np.int16)
    for y in range(h):
        off = y * (stride + 1)
        ft = raw[off]
        line = np.frombuffer(
            raw, dtype=np.uint8, count=stride, offset=off + 1
        ).astype(np.int16)
        if ft == 0:
            rec = line
        elif ft == 2:  # Up
            rec = (line + prev) % 256
        elif ft in (1, 3, 4):
            # Left-dependent filters are sequential in x; recur per
            # pixel over the scanline (C = bytes-per-pixel lag).
            rec = line.copy()
            if ft == 1:  # Sub
                for x in range(c, stride):
                    rec[x] = (rec[x] + rec[x - c]) % 256
            elif ft == 3:  # Average
                for x in range(stride):
                    left = rec[x - c] if x >= c else 0
                    rec[x] = (rec[x] + (left + prev[x]) // 2) % 256
            else:  # Paeth
                for x in range(stride):
                    a = int(rec[x - c]) if x >= c else 0
                    b = int(prev[x])
                    cc = int(prev[x - c]) if x >= c else 0
                    p = a + b - cc
                    pa, pb, pc = abs(p - a), abs(p - b), abs(p - cc)
                    if pa <= pb and pa <= pc:
                        pred = a
                    elif pb <= pc:
                        pred = b
                    else:
                        pred = cc
                    rec[x] = (rec[x] + pred) % 256
        else:
            raise ValueError(f"bad PNG filter type {ft}")
        out[y] = rec.astype(np.uint8).reshape(w, c)
        prev = rec
    return out


# --- BMP ---------------------------------------------------------------------


def encode_bmp(arr: np.ndarray) -> bytes:
    """(H, W, 3) uint8 RGB → 24-bit bottom-up BMP bytes."""
    a = np.asarray(arr, dtype=np.uint8)
    if a.ndim != 3 or a.shape[2] != 3:
        raise ValueError("BMP encoder takes (H, W, 3) RGB")
    h, w, _ = a.shape
    pad = (-(w * 3)) % 4
    rows = bytearray()
    for y in range(h - 1, -1, -1):  # bottom-up
        rows.extend(a[y, :, ::-1].tobytes())  # RGB → BGR
        rows.extend(b"\x00" * pad)
    pixel_off = 14 + 40
    size = pixel_off + len(rows)
    file_hdr = struct.pack("<2sIHHI", b"BM", size, 0, 0, pixel_off)
    info_hdr = struct.pack(
        "<IiiHHIIiiII", 40, w, h, 1, 24, 0, len(rows), 2835, 2835, 0, 0
    )
    return file_hdr + info_hdr + bytes(rows)


def decode_bmp(data: bytes) -> np.ndarray:
    """24-bit uncompressed BMP bytes → (H, W, 3) uint8 RGB raster."""
    if data[:2] != b"BM":
        raise ValueError("not a BMP")
    (pixel_off,) = struct.unpack("<I", data[10:14])
    hdr_size, w, h_signed = struct.unpack("<Iii", data[14:26])
    planes, bpp, compression = struct.unpack("<HHI", data[26:34])
    if hdr_size < 40:
        raise ValueError(f"unsupported BMP header size {hdr_size}")
    if bpp != 24 or compression != 0:
        raise ValueError(f"unsupported BMP (bpp={bpp}, comp={compression})")
    top_down = h_signed < 0
    h = abs(h_signed)
    stride = (w * 3 + 3) & ~3
    need = pixel_off + stride * h
    if len(data) < need:
        raise ValueError("truncated BMP pixel data")
    out = np.zeros((h, w, 3), dtype=np.uint8)
    for i in range(h):
        off = pixel_off + i * stride
        row = np.frombuffer(data, dtype=np.uint8, count=w * 3, offset=off)
        y = i if top_down else h - 1 - i
        out[y] = row.reshape(w, 3)[:, ::-1]  # BGR → RGB
    return out


def decode_image(data: bytes) -> np.ndarray:
    """Sniff + decode → (H, W, C) uint8; ValueError on unknown format."""
    fmt = sniff(data)
    if fmt == "png":
        return decode_png(data)
    if fmt == "bmp":
        return decode_bmp(data)
    raise ValueError("unknown image container (not PNG/BMP)")


def resize_nearest(arr: np.ndarray, width: int, height: int) -> np.ndarray:
    """Nearest-neighbor resample to (height, width) — index gather."""
    a = np.asarray(arr)
    h, w = a.shape[:2]
    ys = np.minimum((np.arange(height) * h) // height, h - 1)
    xs = np.minimum((np.arange(width) * w) // width, w - 1)
    return a[ys][:, xs]

"""Fuzz the native PNG decoder (native/png_decode.cpp) against a
spec-faithful Python encoder.

The project PNG encoder (io/png.py) only emits filter 0, so these tests
build PNG streams by hand to cover what real TUM datasets (written by
libpng/OpenCV — FrontEnd.cpp:220,240 reads them with cv::imread) actually
contain: all five scanline filters, every supported color type (gray, RGB,
palette, gray+alpha, RGBA at 8/16 bit), multi-chunk IDAT, and degenerate
sizes.  Adversarial streams (truncation, bad magic, interlace, bogus
filters, short inflate) must fail with an error code, never crash or
return garbage.
"""

from __future__ import annotations

import struct
import zlib

import numpy as np
import pytest

from staticfusion_tpu.io import native

pytestmark = pytest.mark.skipif(not native.available(),
                                reason="native sfio library unavailable")


def _chunk(tag: bytes, payload: bytes) -> bytes:
    return (struct.pack(">I", len(payload)) + tag + payload
            + struct.pack(">I", zlib.crc32(tag + payload) & 0xFFFFFFFF))


def _paeth(a, b, c):
    p = a + b - c
    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
    if pa <= pb and pa <= pc:
        return a
    if pb <= pc:
        return b
    return c


def _filter_row(raw: np.ndarray, prev: np.ndarray | None, bpp: int,
                ftype: int) -> bytes:
    """Forward-apply one PNG scanline filter (spec section 9)."""
    raw = raw.astype(np.int32)
    up = (prev.astype(np.int32) if prev is not None
          else np.zeros_like(raw))
    left = np.zeros_like(raw)
    left[bpp:] = raw[:-bpp]
    ul = np.zeros_like(raw)
    ul[bpp:] = up[:-bpp]
    if ftype > 4:  # adversarial: bogus filter tag over unfiltered bytes
        return bytes([ftype]) + (raw & 0xFF).astype(np.uint8).tobytes()
    if ftype == 0:
        enc = raw
    elif ftype == 1:
        enc = raw - left
    elif ftype == 2:
        enc = raw - up
    elif ftype == 3:
        enc = raw - ((left + up) >> 1)
    elif ftype == 4:
        pred = np.array([_paeth(int(a), int(b), int(c))
                         for a, b, c in zip(left, up, ul)], np.int32)
        enc = raw - pred
    else:
        raise ValueError(ftype)
    return bytes([ftype]) + (enc & 0xFF).astype(np.uint8).tobytes()


def make_png(img: np.ndarray, color_type: int, filters,
             palette: np.ndarray | None = None,
             idat_split: int = 1, interlace: int = 0) -> bytes:
    """Hand-rolled PNG encoder with per-row filter control.

    img: ct0/ct3 (H,W); ct2 (H,W,3); ct4 (H,W,2); ct6 (H,W,4);
    uint8, or uint16 (big-endian in-stream) for non-palette types."""
    h, w = img.shape[:2]
    ch = 1 if img.ndim == 2 else img.shape[2]
    depth = 16 if img.dtype == np.uint16 else 8
    if color_type == 3:
        assert depth == 8 and palette is not None
    raw = (img.astype(">u2") if depth == 16 else img).tobytes()
    stride = w * ch * depth // 8
    bpp = max(1, ch * depth // 8)

    rows = [np.frombuffer(raw[y * stride:(y + 1) * stride], np.uint8)
            for y in range(h)]
    body = b""
    prev = None
    for y in range(h):
        body += _filter_row(rows[y], prev, bpp, filters[y % len(filters)])
        prev = rows[y]

    ihdr = struct.pack(">IIBBBBB", w, h, depth, color_type, 0, 0, interlace)
    out = b"\x89PNG\r\n\x1a\n" + _chunk(b"IHDR", ihdr)
    if palette is not None:
        out += _chunk(b"PLTE", palette.astype(np.uint8).tobytes())
    z = zlib.compress(body, 6)
    step = max(1, len(z) // idat_split)
    for i in range(0, len(z), step):
        out += _chunk(b"IDAT", z[i:i + step])
    return out + _chunk(b"IEND", b"")


def _decode(tmp_path, data: bytes):
    p = tmp_path / "t.png"
    p.write_bytes(data)
    return native.decode_png(str(p))


CASES = []
for ct, ch in ((0, 1), (2, 3), (4, 2), (6, 4)):
    for depth in (np.uint8, np.uint16):
        CASES.append((ct, ch, depth))


@pytest.mark.parametrize("color_type,ch,dtype", CASES)
def test_fuzz_filters_and_shapes(color_type, ch, dtype, tmp_path):
    rng = np.random.RandomState(hash((color_type, np.dtype(dtype).num))
                                & 0xFFFF)
    hi = 65535 if dtype == np.uint16 else 255
    for h, w in [(1, 1), (1, 7), (5, 1), (16, 16), (13, 37), (48, 31)]:
        shape = (h, w) if ch == 1 else (h, w, ch)
        img = rng.randint(0, hi + 1, shape).astype(dtype)
        filters = list(rng.randint(0, 5, h))
        got = _decode(tmp_path, make_png(img, color_type, filters,
                                         idat_split=int(rng.randint(1, 4))))
        assert got is not None, (color_type, dtype, h, w, filters)
        # Decoder drops alpha: ct0/4 -> gray, ct2/6 -> rgb.
        if ch == 1:
            expect = img
        elif ch == 2:
            expect = img[..., 0]
        else:
            expect = img[..., :3]
        assert got.dtype == dtype
        np.testing.assert_array_equal(got, expect)


def test_fuzz_palette(tmp_path):
    rng = np.random.RandomState(3)
    for h, w, n_pal in [(1, 1, 1), (9, 14, 7), (32, 32, 256)]:
        palette = rng.randint(0, 256, (n_pal, 3)).astype(np.uint8)
        img = rng.randint(0, n_pal, (h, w)).astype(np.uint8)
        filters = list(rng.randint(0, 5, h))
        got = _decode(tmp_path, make_png(img, 3, filters, palette=palette))
        assert got is not None
        np.testing.assert_array_equal(got, palette[img])


def test_palette_index_out_of_range_is_black(tmp_path):
    palette = np.full((4, 3), 200, np.uint8)
    img = np.array([[2, 250]], np.uint8)  # 250 has no palette entry
    got = _decode(tmp_path, make_png(img, 3, [0], palette=palette))
    np.testing.assert_array_equal(got[0, 0], [200, 200, 200])
    np.testing.assert_array_equal(got[0, 1], [0, 0, 0])


def test_each_filter_type_exact(tmp_path):
    """One image, each filter on every row — catches per-filter off-by-ones
    that a random mix could mask."""
    rng = np.random.RandomState(7)
    img = rng.randint(0, 256, (11, 23, 3)).astype(np.uint8)
    for f in range(5):
        got = _decode(tmp_path, make_png(img, 2, [f]))
        np.testing.assert_array_equal(got, img, err_msg=f"filter {f}")


def test_tum_shapes(tmp_path):
    """The actual dataset shapes: 640x480 u16 gray depth + u8 RGB."""
    rng = np.random.RandomState(11)
    depth = (rng.randint(0, 30000, (480, 640))).astype(np.uint16)
    rgb = rng.randint(0, 256, (480, 640, 3)).astype(np.uint8)
    np.testing.assert_array_equal(
        _decode(tmp_path, make_png(depth, 0, [0, 2, 4])), depth)
    np.testing.assert_array_equal(
        _decode(tmp_path, make_png(rgb, 2, [1, 3])), rgb)


def test_adversarial_streams_fail_cleanly(tmp_path):
    rng = np.random.RandomState(5)
    img = rng.randint(0, 256, (8, 8, 3)).astype(np.uint8)
    good = make_png(img, 2, [0, 1, 2, 3, 4])

    bad = [
        b"",                                   # empty
        b"\x89PNG\r\n\x1a",                    # short magic
        b"JUNKJUNK" + good[8:],                # wrong magic
        good[:20],                             # truncated mid-IHDR
        good[:len(good) // 2],                 # truncated mid-IDAT
        make_png(img, 2, [0], interlace=1),    # Adam7 unsupported
        make_png(img, 2, [7]),                 # bogus filter type
    ]
    # Truncated *inflate stream*: valid zlib of too-few rows.
    short = make_png(img[:4], 2, [0])
    hacked = bytearray(short)
    hacked[8 + 8 + 4:8 + 8 + 8] = struct.pack(">I", 8)  # claim height 8
    bad.append(bytes(hacked))
    # Bit depths the loader doesn't need (1/2/4-bit packed).
    ihdr = struct.pack(">IIBBBBB", 8, 8, 4, 0, 0, 0, 0)
    bad.append(b"\x89PNG\r\n\x1a\n" + _chunk(b"IHDR", ihdr)
               + _chunk(b"IDAT", zlib.compress(b"\x00" * 40))
               + _chunk(b"IEND", b""))

    for i, data in enumerate(bad):
        assert _decode(tmp_path, data) is None, f"adversarial case {i}"


def test_random_garbage_never_crashes(tmp_path):
    rng = np.random.RandomState(17)
    magic = b"\x89PNG\r\n\x1a\n"
    for _ in range(50):
        n = int(rng.randint(0, 400))
        data = magic + rng.bytes(n)
        _decode(tmp_path, data)  # any return is fine; no crash/hang

    # Bit-flip corruptions of a valid file.
    img = rng.randint(0, 256, (8, 8, 3)).astype(np.uint8)
    good = bytearray(make_png(img, 2, [0, 1, 2, 3, 4]))
    for _ in range(50):
        c = bytearray(good)
        for _ in range(int(rng.randint(1, 4))):
            c[int(rng.randint(8, len(c)))] ^= 1 << int(rng.randint(8))
        _decode(tmp_path, bytes(c))

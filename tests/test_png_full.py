"""Full-PNG codec (sources/png.py): every legal IHDR shape.

The reference reads PNGs via GDAL/Pillow (karta _gdal.py:114-188); this
suite pins the from-scratch codec across the spec matrix — color types
0/2/3/4/6 x legal bit depths, all five filters, Adam7 interlace, tRNS —
plus the images.decode_png fast-path fallback hook.
"""

import struct
import zlib

import numpy as np
import pytest

from karta_spark.sources.png import (
    _ADAM7, decode_png_full, encode_png_full,
)
from karta_spark.sources.images import decode_png, encode_png


def _rng(seed):
    return np.random.default_rng(seed)


def _gray(h, w, depth, seed=0, dtype=None):
    hi = (1 << depth)
    dt = dtype or (np.uint16 if depth == 16 else np.uint8)
    return _rng(seed).integers(0, hi, size=(h, w), dtype=dt)


MATRIX = [
    # (color_type, depth, channels)
    (0, 1, 1), (0, 2, 1), (0, 4, 1), (0, 8, 1), (0, 16, 1),
    (2, 8, 3), (2, 16, 3),
    (3, 1, 1), (3, 2, 1), (3, 4, 1), (3, 8, 1),
    (4, 8, 2), (4, 16, 2),
    (6, 8, 4), (6, 16, 4),
]


class TestRoundtripMatrix:
    @pytest.mark.parametrize("ct,depth,ch", MATRIX)
    @pytest.mark.parametrize("interlace", [0, 1])
    def test_roundtrip(self, ct, depth, ch, interlace):
        h, w = 13, 17  # odd sizes stress Adam7 ragged passes
        dt = np.uint16 if depth == 16 else np.uint8
        if ct == 3:
            n = 1 << depth
            pal = _rng(7).integers(0, 256, size=(n, 3), dtype=np.uint8)
            idx = _rng(1).integers(0, n, size=(h, w), dtype=np.uint8)
            png = encode_png_full(idx, color_type=3, bit_depth=depth,
                                  palette=pal, interlace=interlace,
                                  filter_types=(0, 1, 2, 3, 4))
            got = decode_png_full(png)
            np.testing.assert_array_equal(got, pal[idx])
            return
        if ch == 1:
            arr = _gray(h, w, depth)
        else:
            arr = _rng(2).integers(0, 1 << depth, size=(h, w, ch), dtype=dt)
        png = encode_png_full(arr, color_type=ct, bit_depth=depth,
                              interlace=interlace,
                              filter_types=(0, 1, 2, 3, 4))
        got = decode_png_full(png)
        np.testing.assert_array_equal(got, arr)
        assert got.dtype == dt

    def test_each_filter_alone(self):
        arr = _gray(9, 11, 8, seed=3)
        for f in range(5):
            png = encode_png_full(arr, filter_types=f, color_type=0)
            np.testing.assert_array_equal(decode_png_full(png), arr)

    def test_rgb_filters_bpp3(self):
        arr = _rng(4).integers(0, 256, size=(8, 10, 3), dtype=np.uint8)
        for f in (1, 3, 4):
            png = encode_png_full(arr, filter_types=f, color_type=2)
            np.testing.assert_array_equal(decode_png_full(png), arr)


class TestAdam7:
    def test_pass_layout_bytes(self):
        # 1x1 image: only pass 7? No — pass 1 covers (0,0); all others
        # are empty and must contribute ZERO bytes (spec §8.2)
        arr = np.array([[123]], dtype=np.uint8)
        png = encode_png_full(arr, interlace=1, color_type=0)
        np.testing.assert_array_equal(decode_png_full(png), arr)

    @pytest.mark.parametrize("h,w", [(1, 1), (2, 3), (7, 7), (8, 8),
                                     (9, 16), (5, 1), (1, 9)])
    def test_sizes(self, h, w):
        arr = _gray(h, w, 8, seed=h * 31 + w)
        png = encode_png_full(arr, interlace=1, color_type=0,
                              filter_types=(2, 4))
        np.testing.assert_array_equal(decode_png_full(png), arr)

    def test_pass_grid_covers_exactly_once(self):
        seen = np.zeros((8, 8), dtype=int)
        for (x0, y0, dx, dy) in _ADAM7:
            seen[y0::dy, x0::dx] += 1
        assert (seen == 1).all()


class TestTrns:
    def test_palette_alpha(self):
        pal = np.array([[255, 0, 0], [0, 255, 0], [0, 0, 255]], np.uint8)
        idx = np.array([[0, 1], [2, 1]], np.uint8)
        png = encode_png_full(idx, color_type=3, bit_depth=8, palette=pal,
                              trns=bytes([255, 0]))  # entry 1 transparent
        got = decode_png_full(png)
        assert got.shape == (2, 2, 4)
        np.testing.assert_array_equal(got[:, :, 3],
                                      [[255, 0], [255, 0]])
        np.testing.assert_array_equal(got[:, :, :3], pal[idx])

    def test_gray_colorkey(self):
        arr = np.array([[7, 8], [7, 9]], np.uint8)
        png = encode_png_full(arr, color_type=0,
                              trns=struct.pack(">H", 7))
        got = decode_png_full(png)
        assert got.shape == (2, 2, 2)
        np.testing.assert_array_equal(got[:, :, 1],
                                      [[0, 255], [0, 255]])

    def test_rgb_colorkey_16bit(self):
        arr = np.zeros((1, 2, 3), np.uint16)
        arr[0, 0] = (1000, 2000, 3000)
        arr[0, 1] = (1000, 2000, 3001)
        png = encode_png_full(arr, color_type=2, bit_depth=16,
                              trns=struct.pack(">HHH", 1000, 2000, 3000))
        got = decode_png_full(png)
        np.testing.assert_array_equal(got[0, :, 3], [0, 65535])


class TestFastPathFallback:
    def test_images_decode_png_palette(self):
        pal = _rng(5).integers(0, 256, size=(16, 3), dtype=np.uint8)
        idx = _rng(6).integers(0, 16, size=(6, 7), dtype=np.uint8)
        png = encode_png_full(idx, color_type=3, bit_depth=4, palette=pal)
        np.testing.assert_array_equal(decode_png(png), pal[idx])

    def test_images_decode_png_interlaced_rgb(self):
        arr = _rng(8).integers(0, 256, size=(12, 5, 3), dtype=np.uint8)
        png = encode_png_full(arr, color_type=2, interlace=1)
        np.testing.assert_array_equal(decode_png(png), arr)

    def test_fast_path_still_fast_shape(self):
        # the bench path must NOT route through the full codec: the
        # simple encoder emits filter-0 8-bit, decode stays exact
        arr = _rng(9).integers(0, 256, size=(16, 16, 3), dtype=np.uint8)
        np.testing.assert_array_equal(decode_png(encode_png(arr)), arr)

    def test_images_decode_png_16bit(self):
        arr = _gray(4, 4, 16, seed=11)
        png = encode_png_full(arr, color_type=0, bit_depth=16)
        got = decode_png(png)
        assert got.dtype == np.uint16
        np.testing.assert_array_equal(got, arr)


class TestSubByteSemantics:
    def test_1bit_values_raw(self):
        arr = np.array([[0, 1, 1, 0, 1, 0, 1, 1, 1]], np.uint8)  # 9 px: pad
        png = encode_png_full(arr, color_type=0, bit_depth=1)
        got = decode_png_full(png)
        np.testing.assert_array_equal(got, arr)  # raw samples, not 0/255

    def test_illegal_header_rejected(self):
        arr = _gray(2, 2, 8)
        with pytest.raises(ValueError):
            encode_png_full(arr, color_type=2, bit_depth=8)  # ch mismatch
        with pytest.raises(ValueError):
            encode_png_full(arr, color_type=0, bit_depth=3)

    def test_idat_split_across_chunks(self):
        # decoders must concatenate multiple IDATs
        arr = _gray(5, 5, 8, seed=12)
        png = encode_png_full(arr, color_type=0)
        # split the single IDAT into two
        i = png.index(b"IDAT") - 4
        (ln,) = struct.unpack(">I", png[i:i + 4])
        body = png[i + 8:i + 8 + ln]
        a, b = body[:3], body[3:]
        def chunk(tag, d):
            return (struct.pack(">I", len(d)) + tag + d
                    + struct.pack(">I", zlib.crc32(tag + d) & 0xFFFFFFFF))
        rebuilt = (png[:i] + chunk(b"IDAT", a) + chunk(b"IDAT", b)
                   + png[i + 12 + ln:])
        np.testing.assert_array_equal(decode_png_full(rebuilt), arr)


class TestApng:
    """APNG (acTL/fcTL/fdAT) on the core codec: compositing parity with
    the GIF/AVI frame-sampling paths."""

    def test_two_full_frames_source_blend(self):
        from karta_spark.sources.png import decode_apng, encode_apng
        rng = np.random.default_rng(0)
        f0 = rng.integers(0, 256, (6, 8, 4), dtype=np.uint8)
        f1 = rng.integers(0, 256, (6, 8, 4), dtype=np.uint8)
        frames, delays = decode_apng(encode_apng([f0, f1], blend=0))
        np.testing.assert_array_equal(frames[0], f0)
        np.testing.assert_array_equal(frames[1], f1)
        assert delays == [(1, 10), (1, 10)]

    def test_sub_rect_placement(self):
        from karta_spark.sources.png import decode_apng, encode_apng
        f0 = np.full((4, 6, 4), 100, np.uint8)
        patch = np.full((2, 3, 4), 200, np.uint8)
        frames, _ = decode_apng(encode_apng(
            [f0, patch], offsets=[(0, 0), (2, 1)], blend=0))
        want = f0.copy()
        want[1:3, 2:5] = 200
        np.testing.assert_array_equal(frames[1], want)

    def test_over_blend_opaque_and_transparent(self):
        from karta_spark.sources.png import decode_apng, encode_apng
        base = np.zeros((1, 2, 4), np.uint8)
        base[0, :] = (10, 20, 30, 200)
        top = np.zeros((1, 2, 4), np.uint8)
        top[0, 0] = (99, 98, 97, 255)   # opaque -> replaces
        top[0, 1] = (50, 50, 50, 0)     # transparent -> keeps dst
        frames, _ = decode_apng(encode_apng([base, top],
                                            blend=[0, 1]))
        np.testing.assert_array_equal(frames[1][0, 0], (99, 98, 97, 255))
        np.testing.assert_array_equal(frames[1][0, 1], (10, 20, 30, 200))

    def test_over_blend_half_alpha(self):
        from karta_spark.sources.png import decode_apng, encode_apng
        base = np.zeros((1, 1, 4), np.uint8)
        base[0, 0] = (0, 0, 0, 255)
        top = np.zeros((1, 1, 4), np.uint8)
        top[0, 0] = (255, 255, 255, 128)
        frames, _ = decode_apng(encode_apng([base, top], blend=[0, 1]))
        got = frames[1][0, 0]
        assert got[3] == 255
        assert 127 <= got[0] <= 129  # ~50% white over black

    def test_dispose_background(self):
        from karta_spark.sources.png import decode_apng, encode_apng
        f0 = np.full((2, 2, 4), 77, np.uint8)
        f1 = np.full((2, 2, 4), 99, np.uint8)
        f2 = np.zeros((1, 1, 4), np.uint8)
        f2[0, 0] = (1, 2, 3, 255)
        frames, _ = decode_apng(encode_apng(
            [f0, f1, f2], offsets=[(0, 0), (0, 0), (1, 1)],
            dispose=[0, 1, 0], blend=0))
        # frame 1 disposed to transparent before frame 2's 1x1 patch
        assert (frames[2][0, 0] == 0).all()
        np.testing.assert_array_equal(frames[2][1, 1], (1, 2, 3, 255))

    def test_dispose_previous(self):
        from karta_spark.sources.png import decode_apng, encode_apng
        f0 = np.full((2, 2, 4), 10, np.uint8)
        f1 = np.full((2, 2, 4), 20, np.uint8)
        f2 = np.full((1, 1, 4), 30, np.uint8)
        frames, _ = decode_apng(encode_apng(
            [f0, f1, f2], offsets=[(0, 0), (0, 0), (0, 0)],
            dispose=[0, 2, 0], blend=0))
        # frame 1's effect reverted before frame 2 draws its 1x1
        np.testing.assert_array_equal(frames[2][1, 1], (10, 10, 10, 10))
        np.testing.assert_array_equal(frames[2][0, 0], (30, 30, 30, 30))

    def test_plain_png_single_frame(self):
        from karta_spark.sources.png import (
            decode_apng, encode_png_full,
        )
        a = np.random.default_rng(3).integers(0, 256, (5, 5, 3),
                                              dtype=np.uint8)
        frames, delays = decode_apng(encode_png_full(a, color_type=2))
        assert frames.shape == (1, 5, 5, 4)
        np.testing.assert_array_equal(frames[0, :, :, :3], a)

"""VP8L lossless WebP codec (sources/webp.py).

Roundtrips across the full feature matrix (all 14 predictors, the four
transforms and their stacking, color cache, LZ77 with neighbor and
plain distance codes, every palette bundling width), plus hand-built
bitstreams for decoder-only paths the encoder does not emit
(meta-prefix groups, the max-symbol shortcut) and the published first
entries of the 2D distance map.
"""

import struct

import numpy as np
import pytest

from karta_spark.sources.webp import (
    _DIST_MAP, _BitReader, _BitWriter, _HuffDecoder, _build_lengths,
    _dist_to_plane, _encode_image_stream, _prefix_decode, _prefix_encode,
    _read_code_lengths, _write_code_lengths, decode_webp, encode_webp,
)


def _rgba(h, w, seed=0):
    return np.random.default_rng(seed).integers(
        0, 256, (h, w, 4), dtype=np.uint8)


class TestDistanceMap:
    def test_published_prefix(self):
        # first 24 entries of the spec's 120-entry table
        want = [(0, 1), (1, 0), (1, 1), (-1, 1), (0, 2), (2, 0),
                (1, 2), (-1, 2), (2, 1), (-2, 1), (2, 2), (-2, 2),
                (0, 3), (3, 0), (1, 3), (-1, 3), (3, 1), (-3, 1),
                (2, 3), (-2, 3), (3, 2), (-3, 2), (0, 4), (4, 0)]
        assert list(_DIST_MAP[:24]) == want
        assert len(_DIST_MAP) == 120

    def test_neighbor_vs_plain(self):
        xsize = 50
        assert _dist_to_plane(2, xsize) == 1       # (1, 0)
        assert _dist_to_plane(1, xsize) == xsize   # (0, 1)
        assert _dist_to_plane(121, xsize) == 1     # plain dist 1
        assert _dist_to_plane(120 + 777, xsize) == 777


class TestPrefixValues:
    @pytest.mark.parametrize("v", [1, 2, 3, 4, 5, 8, 13, 100, 4096, 99999])
    def test_roundtrip(self, v):
        code, extra, ebits = _prefix_encode(v)
        bw = _BitWriter()
        bw.bits(extra, ebits)
        assert _prefix_decode(code, _BitReader(bw.done())) == v


class TestRoundtripMatrix:
    BASE = _rgba(13, 17, seed=2)

    @pytest.mark.parametrize("mode", range(14))
    def test_predictors(self, mode):
        png = encode_webp(self.BASE, predictor=mode, pred_bits=3)
        np.testing.assert_array_equal(decode_webp(png), self.BASE)

    @pytest.mark.parametrize("kw", [
        dict(),
        dict(subtract_green=True),
        dict(subtract_green=True, predictor=7),
        dict(cross_color=(10, -20, 5)),
        dict(cross_color=(-3, 7, -11), predictor=12),
        dict(cache_bits=6),
        dict(use_lz77=True),
        dict(subtract_green=True, predictor=11, cache_bits=7,
             use_lz77=True),
    ])
    def test_transform_combos(self, kw):
        np.testing.assert_array_equal(
            decode_webp(encode_webp(self.BASE, **kw)), self.BASE)

    @pytest.mark.parametrize("ncol", [2, 3, 5, 16, 17, 200])
    def test_palette_bundling(self, ncol):
        rng = np.random.default_rng(ncol)
        pal = rng.integers(0, 256, (ncol, 4), dtype=np.uint8)
        img = pal[rng.integers(0, ncol, (9, 15))]
        got = decode_webp(encode_webp(img, palette=True))
        np.testing.assert_array_equal(got, img)

    def test_lz77_compresses_runs(self):
        img = np.repeat(_rgba(5, 4, seed=9), 16, axis=1)
        short = encode_webp(img, use_lz77=True)
        plain = encode_webp(img)
        np.testing.assert_array_equal(decode_webp(short), img)
        assert len(short) < len(plain) // 2

    @pytest.mark.parametrize("h,w", [(1, 1), (1, 9), (9, 1), (2, 2)])
    def test_degenerate_sizes(self, h, w):
        img = _rgba(h, w, seed=h * 10 + w)
        np.testing.assert_array_equal(decode_webp(encode_webp(img)), img)
        np.testing.assert_array_equal(
            decode_webp(encode_webp(img, predictor=5)), img)

    def test_rgb_and_gray_inputs(self):
        rgb = np.random.default_rng(4).integers(0, 256, (6, 7, 3), np.uint8)
        got = decode_webp(encode_webp(rgb))
        np.testing.assert_array_equal(got[:, :, :3], rgb)
        assert (got[:, :, 3] == 255).all()

    def test_bare_payload_no_container(self):
        img = _rgba(4, 4, seed=5)
        raw = encode_webp(img, container=False)
        assert raw[0] == 0x2F
        np.testing.assert_array_equal(decode_webp(raw), img)

    def test_not_webp(self):
        with pytest.raises(ValueError):
            decode_webp(b"\x89PNG....")
        # lossy VP8 chunks now decode (sources/vp8.py); garbage still
        # raises the uniform ValueError contract
        lossy = (b"RIFF" + struct.pack("<I", 16) + b"WEBP"
                 + b"VP8 " + struct.pack("<I", 4) + b"\x00" * 4)
        with pytest.raises(ValueError):
            decode_webp(lossy)
        # container with no image chunk at all
        empty = (b"RIFF" + struct.pack("<I", 12) + b"WEBP"
                 + b"META" + struct.pack("<I", 0))
        with pytest.raises(ValueError, match="chunk"):
            decode_webp(empty)


class TestHandBuiltStreams:
    """Decoder-only paths, constructed bit by bit."""

    def _header(self, bw, w, h):
        bw.bits(w - 1, 14)
        bw.bits(h - 1, 14)
        bw.bits(0, 1)   # alpha hint
        bw.bits(0, 3)   # version

    def test_meta_prefix_groups(self):
        # 8x4 image, meta_bits=2 (4x4 blocks) -> meta image 2x1 with
        # group ids 0 and 1; each group's five codes are single-symbol
        # (zero bits per pixel), so pixels are wholly determined by the
        # entropy-image segmentation.
        bw = _BitWriter()
        self._header(bw, 8, 4)
        bw.bits(0, 1)   # no transforms
        bw.bits(0, 1)   # no color cache
        bw.bits(1, 1)   # meta prefix present
        bw.bits(0, 3)   # meta_bits = 2
        meta = np.array([0xFF000000, 0xFF000100], np.uint32)  # ids 0, 1
        _encode_image_stream(bw, meta, 2)
        for green, red, blue, alpha in ((10, 20, 30, 255),
                                        (99, 88, 77, 200)):
            for alphabet, sym in ((280, green), (256, red), (256, blue),
                                  (256, alpha), (40, 0)):
                L = [0] * alphabet
                L[sym] = 1
                _write_code_lengths(bw, L)
        data = b"\x2f" + bw.done()
        got = decode_webp(data)
        assert got.shape == (4, 8, 4)
        np.testing.assert_array_equal(got[:, :4],
                                      [[[20, 10, 30, 255]] * 4] * 4)
        np.testing.assert_array_equal(got[:, 4:],
                                      [[[88, 99, 77, 200]] * 4] * 4)

    def test_max_symbol_shortcut(self):
        # full-form green code declared via the max-symbol shortcut:
        # cl code has the single symbol 1 (zero bits per cl read), so
        # lengths[0]=1, lengths[1]=1 after exactly max_symbol=2 reads
        bw = _BitWriter()
        self._header(bw, 4, 1)
        bw.bits(0, 1)   # no transforms
        bw.bits(0, 1)   # no cache
        bw.bits(0, 1)   # no meta
        # green code, full form
        bw.bits(0, 1)
        bw.bits(0, 4)                      # num_cl = 4
        for v in (0, 0, 0, 1):             # order 17,18,0,1 -> cl[1]=1
            bw.bits(v, 3)
        bw.bits(1, 1)                      # use max_symbol
        bw.bits(0, 3)                      # length_nbits = 2
        bw.bits(0, 2)                      # max_symbol = 2
        # red/blue/alpha/distance: simple single-symbol codes
        for alphabet, sym in ((256, 5), (256, 6), (256, 255), (40, 0)):
            L = [0] * alphabet
            L[sym] = 1
            _write_code_lengths(bw, L)
        # four pixels: green bits 0,1,1,0
        for b in (0, 1, 1, 0):
            bw.bits(b, 1)
        got = decode_webp(b"\x2f" + bw.done())
        np.testing.assert_array_equal(got[0, :, 1], [0, 1, 1, 0])
        np.testing.assert_array_equal(got[0, :, 0], [5, 5, 5, 5])

    def test_repeat16_in_roundtrip(self):
        # uniform frequencies force runs of equal lengths -> repeat-16
        freqs = [0] * 280
        for s in range(64, 128):
            freqs[s] = 3
        L = _build_lengths(freqs)
        bw = _BitWriter()
        _write_code_lengths(bw, L)
        dec = _read_code_lengths(_BitReader(bw.done()), 280)
        want = _HuffDecoder(L)
        assert dec.table == want.table


class TestImagesIntegration:
    def test_decode_image_webp(self):
        from karta_spark.sources.images import decode_image
        img = _rgba(5, 6, seed=11)
        got = decode_image(encode_webp(img, subtract_green=True), "webp")
        np.testing.assert_array_equal(got, img)

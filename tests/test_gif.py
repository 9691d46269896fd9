"""GIF codec (sources/gif.py): LZW bit-exactness, container, animation.

The LZW fixture bytes below are hand-packed from the spec's code
assignment rules (LSB-first, late width change) — an oracle independent
of both the encoder and decoder under test.
"""

import numpy as np
import pytest

from karta_spark.sources.gif import (
    decode_gif, encode_gif, gif_frames, lzw_decode, lzw_encode,
    sample_frames,
)


class TestLzw:
    def test_hand_packed_fixture(self):
        # pixels [1,1,2,2], min_code_size=2 -> codes (width):
        # CLEAR=4(3), 1(3), 1(3), 2(3), 2(4), EOI=5(4)
        # LSB-first packing -> 0x4C 0x24 0x05
        assert lzw_encode(np.array([1, 1, 2, 2], np.uint8), 2) == \
            b"\x4c\x24\x05"
        got = lzw_decode(b"\x4c\x24\x05", 2, 4)
        np.testing.assert_array_equal(got, [1, 1, 2, 2])

    @pytest.mark.parametrize("min_code,hi,n", [
        (2, 4, 64), (3, 8, 1000), (8, 256, 5000),
    ])
    def test_roundtrip_random(self, min_code, hi, n):
        rng = np.random.default_rng(n)
        idx = rng.integers(0, hi, size=n, dtype=np.uint8)
        enc = lzw_encode(idx, min_code)
        np.testing.assert_array_equal(lzw_decode(enc, min_code, n), idx)

    def test_table_overflow_clear(self):
        # low-entropy long stream grows the table past 4096 -> encoder
        # must emit CLEAR and both sides stay in sync
        base = np.arange(256, dtype=np.uint8)
        idx = np.concatenate([np.repeat(base, k % 7 + 1)
                              for k in range(60)])
        assert len(idx) > 30000
        enc = lzw_encode(idx, 8)
        np.testing.assert_array_equal(lzw_decode(enc, 8, len(idx)), idx)

    def test_single_pixel(self):
        enc = lzw_encode(np.array([3], np.uint8), 2)
        np.testing.assert_array_equal(lzw_decode(enc, 2, 1), [3])

    def test_kwkwk_case(self):
        # 'aaaa...' forces code==next_code immediately
        idx = np.zeros(20, np.uint8)
        enc = lzw_encode(idx, 2)
        np.testing.assert_array_equal(lzw_decode(enc, 2, 20), idx)


def _pal(n, seed=0):
    return np.random.default_rng(seed).integers(
        0, 256, size=(n, 3), dtype=np.uint8)


class TestContainer:
    def test_single_frame_roundtrip(self):
        pal = _pal(16)
        idx = np.random.default_rng(1).integers(0, 16, (11, 13), np.uint8)
        gif = encode_gif(idx, pal)
        assert gif[:6] == b"GIF89a"
        g = decode_gif(gif)
        assert g["w"] == 13 and g["h"] == 11
        np.testing.assert_array_equal(g["frames"][0]["indices"], idx)
        frames, _ = gif_frames(gif)
        np.testing.assert_array_equal(frames[0], pal[idx])

    def test_interlaced_roundtrip(self):
        pal = _pal(4)
        for h in (1, 2, 5, 8, 17):
            idx = np.random.default_rng(h).integers(0, 4, (h, 6), np.uint8)
            g = decode_gif(encode_gif(idx, pal, interlace=True))
            np.testing.assert_array_equal(g["frames"][0]["indices"], idx)

    def test_local_palette_overrides_global(self):
        gp, lp = _pal(4, 1), _pal(4, 2)
        idx = np.array([[0, 1], [2, 3]], np.uint8)
        gif = encode_gif([idx], gp, local_palettes=[lp])
        frames, _ = gif_frames(gif)
        np.testing.assert_array_equal(frames[0], lp[idx])

    def test_256_color_palette(self):
        pal = _pal(256, 3)
        idx = np.arange(256, dtype=np.uint8).reshape(16, 16)
        frames, _ = gif_frames(encode_gif(idx, pal))
        np.testing.assert_array_equal(frames[0], pal[idx])

    def test_87a_like_minimal(self):
        # no GCE at all (87a shape): still decodes
        pal = _pal(2)
        idx = np.array([[0, 1, 1, 0]], np.uint8)
        gif = encode_gif(idx, pal)
        g = decode_gif(gif)
        assert g["frames"][0]["transparent"] is None
        assert g["frames"][0]["delay_cs"] == 0


class TestAnimation:
    def test_delays_and_disposal_leave(self):
        pal = _pal(8, 4)
        f0 = np.full((4, 4), 1, np.uint8)
        f1 = np.full((4, 4), 2, np.uint8)
        gif = encode_gif([f0, f1], pal, delays_cs=[10, 20], disposal=1,
                         loop=True)
        frames, delays = gif_frames(gif)
        assert delays == [10, 20]
        np.testing.assert_array_equal(frames[0], pal[f0])
        np.testing.assert_array_equal(frames[1], pal[f1])

    def test_transparency_composites_previous(self):
        pal = np.array([[9, 9, 9], [255, 0, 0], [0, 255, 0]], np.uint8)
        f0 = np.full((2, 2), 1, np.uint8)
        f1 = np.array([[2, 0], [0, 2]], np.uint8)  # 0 = transparent
        gif = encode_gif([f0, f1], pal, transparent=[None, 0], disposal=1)
        frames, _ = gif_frames(gif)
        # transparent pixels keep frame-0 red; others green
        np.testing.assert_array_equal(
            frames[1], np.array([[[0, 255, 0], [255, 0, 0]],
                                 [[255, 0, 0], [0, 255, 0]]], np.uint8))

    def test_disposal_background_restore(self):
        pal = np.array([[1, 2, 3], [255, 0, 0], [0, 0, 255]], np.uint8)
        f0 = np.full((2, 2), 1, np.uint8)
        f1 = np.array([[2, 0], [0, 0]], np.uint8)
        gif = encode_gif([f0, f1], pal, transparent=[None, 0],
                         disposal=[2, 0], bg=0)
        frames, _ = gif_frames(gif)
        # frame 0 disposed to background color before frame 1 draws
        want = np.broadcast_to(pal[0], (2, 2, 3)).copy()
        want[0, 0] = pal[2]
        np.testing.assert_array_equal(frames[1], want)

    def test_sample_frames_every_k(self):
        pal = _pal(4, 5)
        fr = [np.full((3, 3), k % 4, np.uint8) for k in range(10)]
        gif = encode_gif(fr, pal, disposal=1)
        ids, got = sample_frames(gif, every=3)
        np.testing.assert_array_equal(ids, [0, 3, 6, 9])
        for i, fid in enumerate(ids):
            np.testing.assert_array_equal(got[i], pal[fr[fid]])

    def test_not_a_gif(self):
        with pytest.raises(ValueError):
            decode_gif(b"PNG not gif")

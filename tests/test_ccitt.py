"""CCITT G3/G4 fax codec tests (VERDICT r5 task 4).

Two independent validation axes:
1. self-roundtrips of the from-scratch encoder/decoder pairs;
2. fixtures compressed by the JDK ImageIO TIFF plugin (a wholly
   independent CCITT implementation) decoded bit-exactly — generated
   once by tools/MakeCcittFixtures.java and checked in under
   tests/data/ccitt/ with .pbm pixel dumps as ground truth.
"""
import glob
import os

import numpy as np
import pytest

from karta_spark.sources import ccitt
from karta_spark.sources import geotiff

FIXDIR = os.path.join(os.path.dirname(__file__), "data", "ccitt")


def _patterns(rng, w, h):
    yield (rng.random((h, w)) < 0.2).astype(np.uint8)          # speckle
    yield np.zeros((h, w), dtype=np.uint8)                     # all white
    yield np.ones((h, w), dtype=np.uint8)                      # all black
    x, y = np.meshgrid(np.arange(w), np.arange(h))
    yield (((x + 2 * y) // 9) % 2).astype(np.uint8)            # diagonals
    txt = np.zeros((h, w), dtype=np.uint8)                     # text-like
    txt[::7] = (x[::7] // 5) % 2
    yield txt


class TestRoundtrips:
    @pytest.mark.parametrize("w,h", [(64, 48), (61, 40), (333, 77), (1, 1),
                                     (2048, 16)])
    def test_g4_roundtrip(self, w, h):
        rng = np.random.default_rng(w * 1000 + h)
        for bm in _patterns(rng, w, h):
            enc = ccitt.encode_g4(bm)
            np.testing.assert_array_equal(ccitt.decode_g4(enc, w, h), bm)

    @pytest.mark.parametrize("w,h", [(64, 48), (61, 40), (333, 77)])
    def test_rle_roundtrip(self, w, h):
        rng = np.random.default_rng(w + h)
        for bm in _patterns(rng, w, h):
            enc = ccitt.encode_mh_rle(bm)
            np.testing.assert_array_equal(ccitt.decode_mh_rle(enc, w, h), bm)

    def test_long_runs_makeup_codes(self):
        # runs > 2560 need chained extended make-ups
        bm = np.zeros((3, 6000), dtype=np.uint8)
        bm[0, 5000:] = 1
        bm[1, :3000] = 1
        np.testing.assert_array_equal(
            ccitt.decode_g4(ccitt.encode_g4(bm), 6000, 3), bm)
        np.testing.assert_array_equal(
            ccitt.decode_mh_rle(ccitt.encode_mh_rle(bm), 6000, 3), bm)


def _load_pbm(path):
    with open(path, "rb") as f:
        magic = f.readline().strip()
        assert magic == b"P4"
        w, h = map(int, f.readline().split())
        rb = (w + 7) // 8
        bits = np.unpackbits(
            np.frombuffer(f.read(rb * h), dtype=np.uint8).reshape(h, rb),
            axis=1)[:, :w]
    return bits  # 1 = black (PBM convention)


@pytest.mark.skipif(not os.path.isdir(FIXDIR),
                    reason="JDK-generated CCITT fixtures not present")
class TestJdkOracle:
    """Decode TIFFs compressed by the JDK's own CCITT implementations."""

    @pytest.mark.parametrize("tif", sorted(
        glob.glob(os.path.join(FIXDIR, "*.tif"))) or ["missing"])
    def test_fixture_bit_exact(self, tif):
        expected_black = _load_pbm(tif[:-4] + ".pbm")
        h, w = expected_black.shape
        with open(tif, "rb") as f:
            m = geotiff.TiffMeta(f)
            assert (m.nx, m.ny) == (w, h)
            assert m.comp in (geotiff.COMPRESSION_CCITT_RLE,
                              geotiff.COMPRESSION_CCITT_G3,
                              geotiff.COMPRESSION_CCITT_G4)
            out = m.read_window(f, 0, h, 0, w)[:, :, 0]
        # sample -> is-black per photometric
        got_black = out if m.photometric == 0 else 1 - out
        np.testing.assert_array_equal(got_black, expected_black)


class TestBilevelGeoTiff:
    @pytest.mark.parametrize("compress", ["g4", "rle", None])
    def test_write_read_roundtrip(self, tmp_path, compress):
        rng = np.random.default_rng(11)
        bm = (rng.random((90, 130)) < 0.15).astype(np.uint8)
        p = str(tmp_path / "doc.tif")
        geotiff.write_bilevel_geotiff(p, bm, 0.0, 90.0, 1.0, 1.0,
                                      compress=compress, rows_per_strip=32)
        with open(p, "rb") as f:
            m = geotiff.TiffMeta(f)
            assert m.dtype == np.uint8 and m.bits == 1
            out = m.read_window(f, 0, 90, 0, 130)[:, :, 0]
        np.testing.assert_array_equal(out, bm)

    def test_lazy_window_skips_strips(self, tmp_path):
        """The strip-organized layout must serve sub-windows correctly
        (the lazy-window path a distributed census query uses)."""
        x, y = np.meshgrid(np.arange(200), np.arange(120))
        bm = (((x // 13) + (y // 7)) % 2).astype(np.uint8)
        p = str(tmp_path / "win.tif")
        geotiff.write_bilevel_geotiff(p, bm, 0.0, 120.0, 1.0, 1.0,
                                      compress="g4", rows_per_strip=16)
        with open(p, "rb") as f:
            m = geotiff.TiffMeta(f)
            win = m.read_window(f, 33, 83, 17, 77)[:, :, 0]
        np.testing.assert_array_equal(win, bm[33:83, 17:77])

    def test_photometric_1_inverts(self, tmp_path):
        bm = np.eye(8, dtype=np.uint8)
        p = str(tmp_path / "inv.tif")
        geotiff.write_bilevel_geotiff(p, bm, 0.0, 8.0, 1.0, 1.0,
                                      compress="g4", photometric=1)
        with open(p, "rb") as f:
            m = geotiff.TiffMeta(f)
            out = m.read_window(f, 0, 8, 0, 8)[:, :, 0]
        np.testing.assert_array_equal(out, 1 - bm)

"""Baseline JPEG codec tests (sources/jpeg.py) — the lossy arm of the
BASELINE decode invariant (PSNR >= 40 dB), previously a Pillow-gated stub.
"""

import numpy as np
import pytest

from karta_spark.sources.images import decode_image, make_row, pixels_for_phash, psnr
from karta_spark.sources.jpeg import (
    decode_jpeg_baseline,
    encode_jpeg_baseline,
    scaled_quant,
    QUANT_LUM,
)


class TestCodec:
    def test_noise_rgb_psnr(self):
        rng = np.random.default_rng(0)
        a = rng.integers(0, 256, (16, 16, 3), dtype=np.uint8)
        dec = decode_jpeg_baseline(encode_jpeg_baseline(a, 98))
        assert dec.shape == a.shape and dec.dtype == np.uint8
        assert psnr(a, dec) >= 40.0

    def test_grayscale(self):
        rng = np.random.default_rng(1)
        a = rng.integers(0, 256, (16, 16), dtype=np.uint8)
        dec = decode_jpeg_baseline(encode_jpeg_baseline(a, 95))
        assert dec.shape == a.shape
        assert psnr(a, dec) >= 40.0

    def test_non_multiple_of_8(self):
        rng = np.random.default_rng(2)
        for shape in [(17, 23, 3), (9, 8), (8, 9, 3), (33, 1, 3)]:
            a = rng.integers(0, 256, shape, dtype=np.uint8)
            dec = decode_jpeg_baseline(encode_jpeg_baseline(a, 98))
            assert dec.shape == a.shape
            assert psnr(a, dec) >= 38.0  # padding edges slightly lossier

    def test_smooth_content_near_lossless(self):
        x = np.linspace(0, 255, 64)
        a = np.clip(np.add.outer(x, x) / 2, 0, 255).astype(np.uint8)
        assert psnr(a, decode_jpeg_baseline(encode_jpeg_baseline(a, 95))) >= 55.0

    def test_flat_blocks_tiny(self):
        a = np.full((32, 32, 3), 137, dtype=np.uint8)
        enc = encode_jpeg_baseline(a, 90)
        dec = decode_jpeg_baseline(enc)
        assert np.abs(dec.astype(int) - 137).max() <= 1
        assert len(enc) < 900  # EOB-only blocks compress hard

    def test_quality_scaling_monotone(self):
        q50 = scaled_quant(QUANT_LUM, 50)
        q95 = scaled_quant(QUANT_LUM, 95)
        q10 = scaled_quant(QUANT_LUM, 10)
        assert (q95 <= q50).all() and (q50 <= q10).all()
        assert (q50 == QUANT_LUM).all()  # scale=100 at q=50

    def test_stream_structure(self):
        a = np.zeros((8, 8, 3), dtype=np.uint8)
        enc = encode_jpeg_baseline(a)
        assert enc[:2] == b"\xff\xd8" and enc[-2:] == b"\xff\xd9"
        assert b"JFIF\x00" in enc[:30]

    def test_rejects_non_jpeg(self):
        with pytest.raises(ValueError):
            decode_jpeg_baseline(b"\x89PNG....")


class TestPipelineIntegration:
    def test_make_row_covers_jpeg_with_psnr_margin(self):
        seen = set()
        for i in range(60):
            _, data, w, h, fmt, _, ph = make_row(i)
            seen.add(fmt)
            pix = decode_image(bytes(data), fmt)
            ref = pixels_for_phash(ph, w, h)
            if pix.ndim == 2:
                pix = np.repeat(pix[:, :, None], 3, 2)
            assert psnr(pix, ref) >= 40.0, (i, fmt)
        assert seen == {"png", "bmp", "jpeg"}

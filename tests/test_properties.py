"""Property-based tests (hypothesis) over the pure-numpy kernel layer.

The reference's suite is golden-value unittest only (SURVEY §5); these
properties harden the kernels against the input space between the goldens.
All JVM-free — they run in milliseconds.
"""

import math

import numpy as np
from hypothesis import given, settings, strategies as st

from karta_spark.functions import cells, crs
from karta_spark.functions.kernels import _split_index, winding_contains
from karta_spark.sources.geotiff import (
    lzw_decode, lzw_encode, packbits_decode, packbits_encode)
from karta_spark.sources.images import psnr
from karta_spark.sources.jpeg import decode_jpeg_baseline, encode_jpeg_baseline

finite_lon = st.floats(min_value=-179.9, max_value=179.9, allow_nan=False)
finite_lat = st.floats(min_value=-84.9, max_value=84.9, allow_nan=False)


class TestCrsProperties:
    @given(finite_lon, finite_lat)
    @settings(max_examples=200, deadline=None)
    def test_webmercator_roundtrip(self, lon, lat):
        x, y = crs.forward_np(crs.WEB_MERCATOR, [lon], [lat])
        lo, la = crs.inverse_np(crs.WEB_MERCATOR, x, y)
        assert abs(lo[0] - lon) < 1e-9 and abs(la[0] - lat) < 1e-9

    @given(st.floats(min_value=-30.0, max_value=30.0), finite_lat,
           st.integers(min_value=1, max_value=60))
    @settings(max_examples=200, deadline=None)
    def test_utm_roundtrip_any_zone(self, dlon, lat, zone):
        cm = 6.0 * zone - 183.0
        c = crs.utm(zone)
        x, y = crs.forward_np(c, [cm + dlon], [lat])
        lo, la = crs.inverse_np(c, x, y)
        assert abs(lo[0] - (cm + dlon)) < 5e-8
        assert abs(la[0] - lat) < 5e-8

    @given(finite_lon, st.floats(min_value=30.0, max_value=89.9))
    @settings(max_examples=200, deadline=None)
    def test_ups_roundtrip_and_radius_monotone(self, lon, lat):
        x, y = crs.forward_np(crs.UPS_NORTH, [lon, lon], [lat, min(lat + 1, 89.95)])
        lo, la = crs.inverse_np(crs.UPS_NORTH, x, y)
        assert abs(lo[0] - lon) < 1e-7 and abs(la[0] - lat) < 1e-7
        # closer to the pole => closer to the false origin
        r0 = math.hypot(x[0] - 2e6, y[0] - 2e6)
        r1 = math.hypot(x[1] - 2e6, y[1] - 2e6)
        assert r1 <= r0 + 1e-6


class TestTileProperties:
    @given(finite_lon, finite_lat, st.integers(min_value=0, max_value=16))
    @settings(max_examples=300, deadline=None)
    def test_tile_bbox_contains_point(self, lon, lat, z):
        x, y = cells.tile_xy_py(lon, lat, z)
        assert 0 <= x < 2 ** z and 0 <= y < 2 ** z
        w, s, e, n = cells.tile_bbox_py(z, x, y)
        assert w - 1e-9 <= lon <= e + 1e-9
        assert s - 1e-6 <= lat <= n + 1e-6


class TestWindingProperties:
    @given(st.lists(st.tuples(
        st.floats(min_value=-100, max_value=100),
        st.floats(min_value=-100, max_value=100)), min_size=3, max_size=12),
        st.floats(min_value=0.01, max_value=0.99),
        st.floats(min_value=0.01, max_value=0.99))
    @settings(max_examples=200, deadline=None)
    def test_convex_hull_interior_contained(self, pts, u, v):
        P = np.array(pts)
        # build a convex polygon via the gift-wrap of the point cloud
        if len(np.unique(P, axis=0)) < 3:
            return
        c = P.mean(axis=0)
        ang = np.arctan2(P[:, 1] - c[1], P[:, 0] - c[0])
        order = np.argsort(ang)
        ring = P[order]
        area2 = np.dot(ring[:, 0], np.roll(ring[:, 1], -1)) - \
            np.dot(ring[:, 1], np.roll(ring[:, 0], -1))
        if abs(area2) < 1e-6:
            return  # degenerate
        # strict interior point: convex combination biased to the centroid
        q = c + 1e-3 * (ring[0] - c) * u * v
        assert winding_contains(np.array([q[0]]), np.array([q[1]]), ring)[0]
        # a point far outside the bbox is never contained
        far = ring[:, 0].max() + 1000.0
        assert not winding_contains(np.array([far]), np.array([0.0]), ring)[0]


class TestSplitIndexProperties:
    @given(st.floats(min_value=-50, max_value=50, allow_nan=False))
    @settings(max_examples=300, deadline=None)
    def test_split_rules(self, v):
        i0, i1 = _split_index(np.array([v]))
        if v != int(v):
            assert i0[0] == math.floor(v) and i1[0] == math.floor(v) + 1
        elif v == 0:
            assert (i0[0], i1[0]) == (0, 1)
        else:
            assert (i0[0], i1[0]) == (v - 1, v)


class TestCodecProperties:
    @given(st.binary(max_size=4000))
    @settings(max_examples=150, deadline=None)
    def test_packbits_roundtrip(self, data):
        assert packbits_decode(packbits_encode(data), len(data)) == data

    @given(st.binary(max_size=4000))
    @settings(max_examples=100, deadline=None)
    def test_lzw_roundtrip(self, data):
        assert lzw_decode(lzw_encode(data), len(data)) == data

    @given(st.integers(min_value=1, max_value=3), st.integers(min_value=4, max_value=40),
           st.integers(min_value=4, max_value=40), st.integers(min_value=0, max_value=2**32 - 1))
    @settings(max_examples=30, deadline=None)
    def test_jpeg_shape_and_quality(self, nch, h, w, seed):
        rng = np.random.default_rng(seed)
        shape = (h, w) if nch == 1 else (h, w, 3)
        a = rng.integers(0, 256, shape, dtype=np.uint8)
        dec = decode_jpeg_baseline(encode_jpeg_baseline(a, 98))
        assert dec.shape == a.shape and dec.dtype == np.uint8
        assert psnr(a if a.ndim == 3 else a[..., None].repeat(1, axis=2),
                    dec if dec.ndim == 3 else dec[..., None].repeat(1, axis=2)) >= 35.0


class TestPortableHashProperties:
    """The portable-hash SQL fragments (the q21/q22 oracle backbone) must
    agree with an independent pure-python model for ANY input, not just
    the corpus — DuckDB evaluates the fragment, python evaluates the
    definition."""

    @staticmethod
    def _py_gram_hash(g: str, n: int) -> int:
        P = 2147483647
        g = (g + "\x01" * n)[:n]
        acc = ord(g[0])
        for ch in g[1:]:
            acc = (acc % P) * 131 + ord(ch)
        return acc % P

    @given(st.text(alphabet=st.characters(min_codepoint=1, max_codepoint=0x2FF),
                   min_size=0, max_size=12),
           st.integers(min_value=2, max_value=10))
    @settings(max_examples=100, deadline=None)
    def test_gram_hash_duckdb_matches_python(self, g, n):
        import duckdb
        from karta_spark.operators.dedup import portable_gram_hash_sql
        # pad the gram exactly as the pipelines do
        frag = portable_gram_hash_sql(f"rpad(substr(g, 1, {n}), {n}, chr(1))", n)
        got = duckdb.connect().execute(
            f"SELECT {frag} FROM (SELECT ? AS g)", [g]).fetchone()[0]
        assert got == self._py_gram_hash(g, n)

    @given(st.integers(min_value=0, max_value=2**62))
    @settings(max_examples=100, deadline=None)
    def test_stratified_hash_never_overflows(self, doc_id):
        import duckdb
        import random
        from karta_spark.operators.dedup import _PORTABLE_P as P
        rng = random.Random(13)
        a, b = rng.randrange(1, P), rng.randrange(0, P)
        got = duckdb.connect().execute(
            f"SELECT ({a} * (CAST(? AS BIGINT) % {P}) + {b}) % {P}",
            [doc_id]).fetchone()[0]
        assert got == (a * (doc_id % P) + b) % P
        assert 0 <= got < P


class TestRound4CodecProperties:
    """Hypothesis coverage for the round-4 codec surface."""

    @given(st.integers(1, 30), st.integers(1, 30),
           st.sampled_from(["444", "422", "420"]), st.booleans(),
           st.integers(0, 2 ** 32 - 1))
    @settings(max_examples=40, deadline=None)
    def test_progressive_equals_baseline_decode(self, h, w, sub, succ, seed):
        from karta_spark.sources.jpeg import encode_jpeg_progressive
        rng = np.random.default_rng(seed)
        a = rng.integers(0, 256, (h, w, 3), dtype=np.uint8)
        prog = encode_jpeg_progressive(a, 90, subsampling=sub, successive=succ)
        base = encode_jpeg_baseline(a, 90, subsampling=sub)
        assert np.array_equal(decode_jpeg_baseline(prog),
                              decode_jpeg_baseline(base))

    @given(st.integers(1, 25), st.integers(1, 25), st.integers(1, 5),
           st.integers(0, 2 ** 32 - 1))
    @settings(max_examples=40, deadline=None)
    def test_subsampled_restart_decodes_shape(self, h, w, ri, seed):
        rng = np.random.default_rng(seed)
        a = rng.integers(0, 256, (h, w, 3), dtype=np.uint8)
        dec = decode_jpeg_baseline(encode_jpeg_baseline(
            a, 95, subsampling="420", restart_interval=ri))
        assert dec.shape == a.shape

    @given(st.integers(1, 20), st.integers(1, 20),
           st.lists(st.integers(0, 4), min_size=1, max_size=5),
           st.integers(0, 2 ** 32 - 1))
    @settings(max_examples=40, deadline=None)
    def test_png_any_filter_mix_roundtrips(self, h, w, ftypes, seed):
        from tests.test_round4_fixes import TestPngAllFilters
        from karta_spark.sources.images import decode_png
        rng = np.random.default_rng(seed)
        a = rng.integers(0, 256, (h, w, 3), dtype=np.uint8)
        enc = TestPngAllFilters._encode_with_filters(a, ftypes)
        assert np.array_equal(decode_png(enc), a)

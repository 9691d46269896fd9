"""Round-4 regression tests (VERDICT r3 roadmap + ADVICE findings)."""
import numpy as np
import pytest


class TestKnnEmptyQueries:
    """ADVICE r3 (medium): empty queries input made the widening loop
    break before round one, so results==[] and results[0] raised."""

    def test_empty_queries_returns_empty_with_contract_schema(self, spark):
        import pandas as pd
        from karta_spark.operators.knn import knn_join
        pts = spark.createDataFrame(pd.DataFrame(
            {"point_id": [1, 2, 3], "x": [0.0, 1.0, 2.0], "y": [0.0, 1.0, 2.0]}))
        qs = spark.createDataFrame(
            [], "query_id long, qx double, qy double")
        out = knn_join(qs, pts, k=2)
        assert out.count() == 0
        assert [f.name for f in out.schema.fields] == \
            ["query_id", "point_id", "dist", "rank"]


class TestFromProj4Strictness:
    """ADVICE r3 (low): unsupported merc/stere variants must raise, not
    silently coerce to WEB_MERCATOR / polar stereographic."""

    def test_nonpolar_stere_routes_to_oblique_kind(self):
        # r4 rejected these rather than silently coercing to the polar
        # kind; since round 7 plain oblique stereographic is a real
        # kind of its own (q97) — still never coerced to polar
        from karta_spark.functions import crs
        c = crs.from_proj4("+proj=stere +lat_0=45 +lon_0=0 +k=1")
        assert c.kind == "stere_obl" and c.params[0] == 45.0

    def test_ellipsoidal_merc_resolves_to_true_mercator(self):
        # r4 rejected these rather than silently coercing to Web
        # Mercator; since r6 they resolve to the TRUE ellipsoidal
        # Mercator kind (EPSG 9804) — still never coerced to spherical.
        from karta_spark.functions import crs
        c = crs.from_proj4("+proj=merc +a=6378137 +b=6356752.3142 +lon_0=0")
        assert c.kind == "merc" and c is not crs.WEB_MERCATOR

    def test_offset_merc_resolves_to_true_mercator(self):
        from karta_spark.functions import crs
        c = crs.from_proj4("+proj=merc +lon_0=110 +k=1")
        assert c.kind == "merc" and c.params == (0.0, 110.0, 1.0, 0.0, 0.0)

    def test_webmercator_roundtrip_still_accepted(self):
        from karta_spark.functions import crs
        assert crs.from_proj4(crs.to_proj4(crs.WEB_MERCATOR)) is crs.WEB_MERCATOR
        for named in (crs.UPS_NORTH, crs.UPS_SOUTH,
                      crs.NSIDC_NORTH, crs.NSIDC_SOUTH):
            assert crs.from_proj4(crs.to_proj4(named)) is named


class TestPolarRingGuard:
    """VERDICT r3 item 6: the polar arm of point_in_polygon_join_table is
    a broadcast cross-join; a polar-heavy table must fail loudly."""

    @staticmethod
    def _polar_ring(lon0):
        # a ring encircling the north pole (azimuth swings a full turn)
        lons = (np.arange(0.0, 360.0, 45.0) + lon0) % 360.0 - 180.0
        return [{"x": float(lo), "y": 80.0} for lo in lons]

    def test_polar_heavy_table_raises(self, spark):
        from karta_spark.operators.pip_join import point_in_polygon_join_table
        import pandas as pd
        polys = spark.createDataFrame(
            [(f"p{i}", self._polar_ring(i)) for i in range(5)],
            "poly_id string, vertices array<struct<x double, y double>>")
        pts = spark.createDataFrame(pd.DataFrame(
            {"pid": [0, 1], "x": [10.0, -120.0], "y": [85.0, 40.0]}))
        with pytest.raises(ValueError, match="polar rings exceed"):
            point_in_polygon_join_table(
                pts, polys, zoom=4, small_table_threshold=None,
                max_polar_rings=3)

    def test_guard_disabled_still_runs(self, spark):
        from karta_spark.operators.pip_join import point_in_polygon_join_table
        import pandas as pd
        polys = spark.createDataFrame(
            [(f"p{i}", self._polar_ring(i)) for i in range(5)],
            "poly_id string, vertices array<struct<x double, y double>>")
        pts = spark.createDataFrame(pd.DataFrame(
            {"pid": [0, 1], "x": [10.0, -120.0], "y": [85.0, 40.0]}))
        out = point_in_polygon_join_table(
            pts, polys, zoom=4, small_table_threshold=None,
            max_polar_rings=None)
        rows = out.collect()
        # the lat-85 point is inside every polar ring; lat-40 in none
        assert sorted({r.pid for r in rows}) == [0]
        assert len(rows) == 5


class TestNgramAutoStrategy:
    """VERDICT r3 item 5: strategy='auto' picks grouped for small corpora,
    two_pass above NGRAM_GROUPED_MAX_DOCS, and both agree exactly."""

    def _docs(self, spark):
        import pandas as pd
        base = "the quick brown fox jumps over the lazy dog "
        rows = []
        for i in range(30):
            rows.append((i, base + f"variant {i % 7}"))
        return spark.createDataFrame(pd.DataFrame(rows, columns=["doc_id", "text"]))

    def test_auto_equals_both_explicit_strategies(self, spark):
        from karta_spark.operators import dedup

        def norm(df):
            return sorted((r.id_a, r.id_b, round(r.jaccard, 12))
                          for r in df.collect())

        docs = self._docs(spark)
        got_auto = norm(dedup.ngram_jaccard_pairs(docs, "text", "doc_id",
                                                  threshold=0.5))
        got_g = norm(dedup.ngram_jaccard_pairs(docs, "text", "doc_id",
                                               threshold=0.5, strategy="grouped"))
        got_t = norm(dedup.ngram_jaccard_pairs(docs, "text", "doc_id",
                                               threshold=0.5, strategy="two_pass"))
        assert got_auto == got_g == got_t
        assert len(got_auto) > 0

    def test_auto_threshold_boundary(self, spark, monkeypatch):
        from karta_spark.operators import dedup
        docs = self._docs(spark)
        # force the corpus over the threshold: auto must take two_pass
        monkeypatch.setattr(dedup, "NGRAM_GROUPED_MAX_DOCS", 10)
        got = sorted((r.id_a, r.id_b) for r in dedup.ngram_jaccard_pairs(
            docs, "text", "doc_id", threshold=0.5).collect())
        want = sorted((r.id_a, r.id_b) for r in dedup.ngram_jaccard_pairs(
            docs, "text", "doc_id", threshold=0.5, strategy="two_pass").collect())
        assert got == want

    def test_unknown_strategy_raises(self, spark):
        from karta_spark.operators import dedup
        with pytest.raises(ValueError, match="strategy"):
            dedup.ngram_jaccard_pairs(self._docs(spark), "text", "doc_id",
                                      strategy="bogus")


class TestOversizedBucketStats:
    """ADVICE r3 (low): the degenerate-bucket guard's recall loss must be
    auditable — oversized_bucket_stats reports what the guard drops."""

    def test_stats_match_guard(self, spark):
        import pandas as pd
        from pyspark.sql import functions as F
        from karta_spark.operators.dedup import (
            _drop_oversized_buckets, oversized_bucket_stats)
        rows = [("a%d" % i, 0, 7) for i in range(10)] + \
               [("b%d" % i, 1, 9) for i in range(3)]
        banded = spark.createDataFrame(
            pd.DataFrame(rows, columns=["id", "band", "key"]))
        stats = oversized_bucket_stats(banded, ("band", "key"), 5).collect()
        assert len(stats) == 1
        assert stats[0].band == 0 and stats[0].members == 10
        assert stats[0].dropped_pairs == 45
        kept = _drop_oversized_buckets(banded, ("band", "key"), 5)
        assert kept.count() == 3
        assert oversized_bucket_stats(banded, ("band", "key"), 100).count() == 0


class TestWkt:
    """VERDICT r3 item 7: WKT1 interchange surface mirroring the
    reference's CRS.get_wkt (crs.py:143-158, via osgeo.osr there)."""

    def test_named_registry_roundtrip(self):
        from karta_spark.functions import crs
        named = [crs.LONLAT, crs.LONLAT_NAD27, crs.LONLAT_NAD83,
                 crs.WEB_MERCATOR, crs.UPS_NORTH, crs.UPS_SOUTH,
                 crs.NSIDC_NORTH, crs.NSIDC_SOUTH, crs.LAEA_WGS84,
                 crs.GALL_PETERS, crs.utm(10), crs.utm(33, True),
                 crs.tmerc(9.0), crs.albers(55, 65, 50, -154)]
        for c in named:
            back = crs.from_wkt(crs.to_wkt(c))
            assert back == c, (c.name, back.name)

    def test_parses_gdal_flavored_epsg32610(self):
        # real-world WKT with AUTHORITY/AXIS decorations the emitter omits
        from karta_spark.functions import crs
        s = ('PROJCS["WGS 84 / UTM zone 10N",GEOGCS["WGS 84",'
             'DATUM["WGS_1984",SPHEROID["WGS 84",6378137,298.257223563,'
             'AUTHORITY["EPSG","7030"]],AUTHORITY["EPSG","6326"]],'
             'PRIMEM["Greenwich",0,AUTHORITY["EPSG","8901"]],'
             'UNIT["degree",0.0174532925199433,AUTHORITY["EPSG","9122"]],'
             'AUTHORITY["EPSG","4326"]],PROJECTION["Transverse_Mercator"],'
             'PARAMETER["latitude_of_origin",0],'
             'PARAMETER["central_meridian",-123],'
             'PARAMETER["scale_factor",0.9996],'
             'PARAMETER["false_easting",500000],'
             'PARAMETER["false_northing",0],'
             'UNIT["metre",1,AUTHORITY["EPSG","9001"]],'
             'AXIS["Easting",EAST],AXIS["Northing",NORTH],'
             'AUTHORITY["EPSG","32610"]]')
        assert crs.from_wkt(s) == crs.utm(10)

    def test_geogcs_datum_dispatch(self):
        from karta_spark.functions import crs
        assert crs.from_wkt(crs.to_wkt(crs.LONLAT)) is crs.LONLAT
        nad27 = ('GEOGCS["NAD27",DATUM["North_American_Datum_1927",'
                 'SPHEROID["Clarke 1866",6378206.4,294.978698213898]],'
                 'PRIMEM["Greenwich",0],UNIT["degree",0.0174532925199433]]')
        assert crs.from_wkt(nad27) is crs.LONLAT_NAD27

    def test_unsupported_projection_raises(self):
        from karta_spark.functions import crs
        s = ('PROJCS["x",GEOGCS["WGS 84",DATUM["WGS_1984",'
             'SPHEROID["WGS 84",6378137,298.257223563]],'
             'PRIMEM["Greenwich",0],UNIT["degree",0.0174532925199433]],'
             'PROJECTION["Robinson"],PARAMETER["central_meridian",0],'
             'UNIT["metre",1]]')
        # round 5 made Sinusoidal (the old probe) a supported kind;
        # Robinson (table-interpolated) stays genuinely unsupported
        with pytest.raises(ValueError, match="Robinson"):
            crs.from_wkt(s)

    def test_ellipsoidal_mercator_wkt_resolves(self):
        # r4/r5 raised here (no ellipsoidal-mercator math existed);
        # round 6 added the TRUE Mercator kind, so this WKT — no
        # Pseudo-Mercator name, ellipsoidal WGS84 — now resolves to it
        # (still never silently coerced to spherical Web Mercator).
        from karta_spark.functions import crs
        s = ('PROJCS["x",GEOGCS["WGS 84",DATUM["WGS_1984",'
             'SPHEROID["WGS 84",6378137,298.257223563]],'
             'PRIMEM["Greenwich",0],UNIT["degree",0.0174532925199433]],'
             'PROJECTION["Mercator_1SP"],PARAMETER["central_meridian",0],'
             'PARAMETER["scale_factor",1],UNIT["metre",1]]')
        c = crs.from_wkt(s)
        assert c is crs.WORLD_MERCATOR


class TestKnnBroadcastKernel:
    """Round-4 perf: small point sides dispatch to the broadcast numpy
    kernel (no join, no window shuffle) — must be BIT-identical to the
    ring path for planar."""

    def _data(self, spark, n_q=40, n_p=300):
        import pandas as pd
        rng = np.random.default_rng(3)
        q = spark.createDataFrame(pd.DataFrame({
            "query_id": np.arange(n_q),
            "qx": rng.uniform(-170, 170, n_q),
            "qy": rng.uniform(-80, 80, n_q)}))
        p = spark.createDataFrame(pd.DataFrame({
            "point_id": np.arange(n_p),
            "x": rng.uniform(-170, 170, n_p),
            "y": rng.uniform(-80, 80, n_p)}))
        return q, p

    def test_kernel_bit_equals_ring_path_planar(self, spark):
        from karta_spark.operators import knn
        q, p = self._data(spark)
        ring = sorted(map(tuple, knn.knn_join(q, p, k=4, zoom=3).collect()))
        kern = sorted(map(tuple, knn.knn_join(q, p, k=4, zoom=None).collect()))
        assert ring == kern  # exact float equality, ranks included
        assert len(kern) == 40 * 4

    def test_tie_break_lowest_point_id(self, spark):
        # two points equidistant from the query: lower id must rank first
        import pandas as pd
        from karta_spark.operators import knn
        q = spark.createDataFrame(pd.DataFrame(
            {"query_id": [0], "qx": [0.0], "qy": [0.0]}))
        p = spark.createDataFrame(pd.DataFrame(
            {"point_id": [7, 3, 9], "x": [1.0, -1.0, 5.0], "y": [0.0, 0.0, 0.0]}))
        out = {r.rank: r.point_id
               for r in knn.knn_join(q, p, k=3, zoom=None).collect()}
        assert out == {1: 3, 2: 7, 3: 9}

    def test_k_exceeds_point_count(self, spark):
        import pandas as pd
        from karta_spark.operators import knn
        q = spark.createDataFrame(pd.DataFrame(
            {"query_id": [0, 1], "qx": [0.0, 2.0], "qy": [0.0, 2.0]}))
        p = spark.createDataFrame(pd.DataFrame(
            {"point_id": [1, 2], "x": [1.0, 3.0], "y": [0.0, 0.0]}))
        out = knn.knn_join(q, p, k=5, zoom=None).collect()
        assert len(out) == 4  # 2 queries x min(k, n_points)=2

    def test_spherical_keeps_ring_path(self, spark):
        # the auto dispatch must NOT reroute spherical (ulp drift) — the
        # zoom=None spherical plan still matches the explicit-zoom plan
        from karta_spark.operators import knn
        q, p = self._data(spark, 15, 120)
        a = sorted(map(tuple,
                       knn.knn_join(q, p, k=3, zoom=3, spherical=True).collect()))
        b = sorted(map(tuple,
                       knn.knn_join(q, p, k=3, zoom=None, spherical=True).collect()))
        assert a == b


class TestPackTokenSpans:
    """Round-4 training-data op: GPT-style concat-then-chunk sequence
    packing, sharded (text.pack_token_spans)."""

    def test_single_shard_offsets_and_spanning(self, spark):
        import pandas as pd
        from karta_spark.operators import text as T
        from pyspark.sql import functions as F
        docs = spark.createDataFrame(pd.DataFrame({
            "doc_id": [0, 1, 2, 3, 4],
            "n": [3, 4, 0, 6, 2]}))  # doc 2 empty -> dropped
        out = {r.doc_id: r for r in T.pack_token_spans(
            docs, F.col("n"), budget=5, shards=1, shard_by="mod").collect()}
        assert set(out) == {0, 1, 3, 4}
        # stream: d0 [0,3) d1 [3,7) d3 [7,13) d4 [13,15); budget 5
        assert (out[0].tok_start, out[0].tok_end) == (0, 3)
        assert (out[0].seq_first, out[0].seq_last) == (0, 0)
        assert (out[1].seq_first, out[1].seq_last) == (0, 1)  # spans 5
        assert out[1].n_seqs_spanned == 2
        assert (out[3].seq_first, out[3].seq_last) == (1, 2)  # [7,13) spans 10
        assert (out[4].seq_first, out[4].seq_last) == (2, 2)

    def test_exact_boundary_does_not_span(self, spark):
        import pandas as pd
        from karta_spark.operators import text as T
        from pyspark.sql import functions as F
        docs = spark.createDataFrame(pd.DataFrame(
            {"doc_id": [0, 1], "n": [5, 5]}))
        out = {r.doc_id: r for r in T.pack_token_spans(
            docs, F.col("n"), budget=5, shards=1, shard_by="mod").collect()}
        assert out[0].n_seqs_spanned == 1 and out[1].n_seqs_spanned == 1
        assert (out[1].seq_first, out[1].seq_last) == (1, 1)

    def test_sharding_partitions_streams(self, spark):
        import pandas as pd
        from karta_spark.operators import text as T
        from pyspark.sql import functions as F
        docs = spark.createDataFrame(pd.DataFrame(
            {"doc_id": list(range(10)), "n": [3] * 10}))
        out = T.pack_token_spans(docs, F.col("n"), budget=4, shards=2,
                                 shard_by="mod").collect()
        for r in out:
            assert r.shard == r.doc_id % 2
        # each shard has 5 docs x 3 tokens: offsets restart per shard
        for shard in (0, 1):
            ends = sorted(r.tok_end for r in out if r.shard == shard)
            assert ends == [3, 6, 9, 12, 15]

    def test_hash_and_mod_agree_within_shard_algebra(self, spark):
        # same docs, different shard fn: per-shard stream algebra must be
        # self-consistent (tok_end increments by n in id order)
        import pandas as pd
        from karta_spark.operators import text as T
        from pyspark.sql import functions as F
        rng = np.random.default_rng(5)
        docs = spark.createDataFrame(pd.DataFrame(
            {"doc_id": list(range(100)),
             "n": rng.integers(1, 50, 100).tolist()}))
        for mode in ("hash", "mod"):
            rows = T.pack_token_spans(docs, F.col("n"), budget=64,
                                      shards=4, shard_by=mode).collect()
            by_shard = {}
            for r in sorted(rows, key=lambda r: (r.shard, r.doc_id)):
                prev = by_shard.get(r.shard, 0)
                assert r.tok_start == prev, (mode, r)
                by_shard[r.shard] = r.tok_end
        with pytest.raises(ValueError, match="shard_by"):
            T.pack_token_spans(docs, F.col("n"), shard_by="bogus").collect()


class TestPngAllFilters:
    """Round-4: PNG filters 3 (Average) and 4 (Paeth) — real-world
    encoders emit them heavily; previously only 0-2 decoded."""

    @staticmethod
    def _encode_with_filters(arr, ftypes):
        """Test-side PNG writer applying a chosen filter per row
        (forward filtering per RFC 2083 §6) — independent of the
        library's filter-0-only encoder."""
        import struct
        import zlib
        h, w, nch = arr.shape[0], arr.shape[1], (arr.shape[2] if arr.ndim == 3 else 1)
        raw_rows = arr.reshape(h, w * nch).astype(np.int32)
        out_rows = []
        for i in range(h):
            ft = ftypes[i % len(ftypes)]
            cur = raw_rows[i]
            prev = raw_rows[i - 1] if i else np.zeros(w * nch, np.int32)
            f = np.empty(w * nch, np.int32)
            for j in range(w * nch):
                a = int(cur[j - nch]) if j >= nch else 0
                b = int(prev[j])
                c = int(prev[j - nch]) if (i and j >= nch) else 0
                if ft == 0:
                    pred = 0
                elif ft == 1:
                    pred = a
                elif ft == 2:
                    pred = b if i else 0
                elif ft == 3:
                    pred = (a + (b if i else 0)) >> 1
                else:  # Paeth
                    p = a + b - c
                    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                    pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
                f[j] = (cur[j] - pred) & 0xFF
            out_rows.append(bytes([ft]) + f.astype(np.uint8).tobytes())
        raw = b"".join(out_rows)

        def chunk(tag, data):
            return (struct.pack(">I", len(data)) + tag + data
                    + struct.pack(">I", zlib.crc32(tag + data) & 0xFFFFFFFF))

        color = 2 if nch == 3 else 0
        ihdr = struct.pack(">IIBBBBB", w, h, 8, color, 0, 0, 0)
        return (b"\x89PNG\r\n\x1a\n" + chunk(b"IHDR", ihdr)
                + chunk(b"IDAT", zlib.compress(raw, 6)) + chunk(b"IEND", b""))

    @pytest.mark.parametrize("ftypes", [[3], [4], [0, 1, 2, 3, 4], [4, 3]])
    def test_filters_roundtrip_rgb(self, ftypes):
        from karta_spark.sources.images import decode_png
        rng = np.random.default_rng(sum(ftypes) + 1)
        a = rng.integers(0, 256, (13, 9, 3), dtype=np.uint8)
        dec = decode_png(self._encode_with_filters(a, ftypes))
        assert np.array_equal(dec, a), ftypes

    @pytest.mark.parametrize("ftypes", [[3], [4]])
    def test_filters_roundtrip_gray(self, ftypes):
        from karta_spark.sources.images import decode_png
        rng = np.random.default_rng(9)
        a = rng.integers(0, 256, (7, 11), dtype=np.uint8)
        dec = decode_png(self._encode_with_filters(a, ftypes))
        assert np.array_equal(dec, a), ftypes


class TestTokenBudgetSample:
    """Round-4 mixture primitive: deterministic per-source take-until-
    token-budget (text.token_budget_sample, two-pass bucketed plan)."""

    def _docs(self, spark, n=120, sources=3):
        import pandas as pd
        rng = np.random.default_rng(17)
        return spark.createDataFrame(pd.DataFrame({
            "doc_id": np.arange(n),
            "source": ["s%d" % (i % sources) for i in range(n)],
            "n": rng.integers(1, 40, n)}))

    @staticmethod
    def _naive(spark, docs, budget):
        """Ground truth: plain per-source running-total window."""
        from pyspark.sql import Window
        from pyspark.sql import functions as F
        from karta_spark.operators.text import _portable_affine
        h, *_ = _portable_affine("doc_id", 13)
        w = Window.partitionBy("source").orderBy(h.asc(), F.col("doc_id").asc())
        c = docs.withColumn("_cum", F.sum("n").over(w) - F.col("n"))
        return {(r.source, r.doc_id) for r in c.where(F.col("_cum") < budget).collect()}

    @pytest.mark.parametrize("budget,n_buckets", [(100, 8), (100, 4096),
                                                  (5, 16), (10**9, 8)])
    def test_matches_naive_window(self, spark, budget, n_buckets):
        from pyspark.sql import functions as F
        from karta_spark.operators.text import token_budget_sample
        docs = self._docs(spark)
        got = {(r.source, r.id) for r in token_budget_sample(
            docs, "source", F.col("n"), budget, id_col="doc_id",
            n_buckets=n_buckets).collect()}
        assert got == self._naive(spark, docs, budget)
        if budget == 10**9:
            assert len(got) == 120  # everything fits

    def test_dict_budgets_and_dropped_sources(self, spark):
        from pyspark.sql import functions as F
        from karta_spark.operators.text import token_budget_sample
        docs = self._docs(spark)
        got = token_budget_sample(
            docs, "source", F.col("n"), {"s0": 50, "s1": 0},
            id_col="doc_id").collect()
        srcs = {r.source for r in got}
        assert srcs == {"s0"}  # s1 budget<=0 and s2 absent both drop
        toks = sorted(r.n_tokens for r in got)
        # inclusive crossing: total >= 50, and removing the largest-kept
        # crossing doc would go under
        assert sum(toks) >= 50

    def test_budget_met_inclusively(self, spark):
        import pandas as pd
        from pyspark.sql import functions as F
        from karta_spark.operators.text import token_budget_sample
        docs = spark.createDataFrame(pd.DataFrame(
            {"doc_id": [1, 2, 3], "source": ["a"] * 3, "n": [10, 10, 10]}))
        got = token_budget_sample(docs, "source", F.col("n"), 15,
                                  id_col="doc_id").collect()
        # cum_before of docs in hash order: 0, 10, 20 -> first two kept
        assert len(got) == 2 and sum(r.n_tokens for r in got) == 20


class TestPiiRedaction:
    """Round-4: portable PII scrub (emails/phones/IPv4) — RE2-safe
    patterns identical across Spark (Java regex) and DuckDB (RE2)."""

    def test_redaction_cases(self, spark):
        import pandas as pd
        from pyspark.sql import functions as F
        from karta_spark.operators import text as T
        rows = [
            ("contact john.doe+x@sub.example.co.uk now",
             "contact <EMAIL> now"),
            ("call +1 (555) 123-4567 or 555-123-4567",
             "call <PHONE> or <PHONE>"),
            ("host 10.0.0.1 bad 999.1.1.1",
             "host <IP> bad 999.1.1.1"),
            ("clean text stays clean", "clean text stays clean"),
        ]
        df = spark.createDataFrame(pd.DataFrame(rows, columns=["t", "want"]))
        got = df.select(T.redact_pii(F.col("t")).alias("got"), "want").collect()
        for r in got:
            assert r.got == r.want, (r.got, r.want)

    def test_flags(self, spark):
        import pandas as pd
        from pyspark.sql import functions as F
        from karta_spark.operators import text as T
        df = spark.createDataFrame(pd.DataFrame(
            {"t": ["a@b.io", "555-123-4567", "1.2.3.4", "none"]}))
        rows = df.select(*T.pii_flags(F.col("t"))).collect()
        assert [r.has_email for r in rows] == [True, False, False, False]
        assert [r.has_phone for r in rows] == [False, True, False, False]
        assert [r.has_ip for r in rows] == [False, False, True, False]

    def test_duckdb_twin_byte_identical(self, spark):
        import duckdb
        import pandas as pd
        from pyspark.sql import functions as F
        from karta_spark.operators import text as T
        texts = ["mail x.y-z@q.museum and 212.555.0100? maybe",
                 "ip 255.255.255.255 edge", "a@b.c not-an-email@",
                 "+999 (123) 456-7890 and 12-345-6789"]
        df = spark.createDataFrame(pd.DataFrame({"t": texts}))
        got_spark = [r[0] for r in
                     df.select(T.redact_pii(F.col("t"))).collect()]
        con = duckdb.connect()
        got_duck = [con.execute(
            "SELECT " + T.pii_redact_sql("?::VARCHAR"), [t]).fetchone()[0]
            for t in texts]
        assert got_spark == got_duck

"""Round-5 regression tests (r4 ADVICE findings + VERDICT r4 roadmap)."""
import numpy as np
import pytest


class TestKnnBoundaryTies:
    """ADVICE r4 (medium): knn_broadcast_kernel must match the ring
    path's (dist asc, point_id asc) tie-break even when a tie group
    STRADDLES the k-th rank (argpartition picks arbitrary members of a
    tied group — more tied points than remaining slots)."""

    @staticmethod
    def _tie_frames(spark):
        import pandas as pd
        # 8 points on a unit circle around (0,0): all exactly tied at
        # dist 1 from the query; plus one closer point.  k=4 leaves 3
        # slots for an 8-way tie — the kernel must pick the 3 LOWEST
        # point_ids, like row_number() over (dist, point_id) would.
        # axis points and 3-4-5 points: sqrt(x*x+y*y) == 1.0 EXACTLY in
        # float64 for all eight (verified), so the tie is bit-for-bit
        px = [1.0, 0.0, -1.0, 0.0, 0.6, -0.6, -0.6, 0.6, 0.25]
        py = [0.0, 1.0, 0.0, -1.0, 0.8, 0.8, -0.8, -0.8, 0.0]
        pids = [10, 11, 12, 13, 14, 15, 16, 17, 5]
        pts = spark.createDataFrame(pd.DataFrame(
            {"point_id": pids, "x": [float(v) for v in px],
             "y": [float(v) for v in py]}))
        qs = spark.createDataFrame(pd.DataFrame(
            {"query_id": [1], "qx": [0.0], "qy": [0.0]}))
        return qs, pts

    def test_kernel_picks_lowest_pids_in_straddling_tie(self, spark):
        from karta_spark.operators.knn import knn_broadcast_kernel
        qs, pts = self._tie_frames(spark)
        out = knn_broadcast_kernel(qs, pts, k=4).orderBy("rank").collect()
        # rank 1: pid 5 (dist 0.25); ranks 2-4: the 3 LOWEST of the
        # 8-way dist-1.0 tie group -> pids 10, 11, 12
        assert [r["point_id"] for r in out] == [5, 10, 11, 12]
        assert [r["rank"] for r in out] == [1, 2, 3, 4]

    def test_kernel_matches_ring_path_on_ties(self, spark):
        from karta_spark.operators.knn import knn_broadcast_kernel, knn_join
        qs, pts = self._tie_frames(spark)
        kern = knn_broadcast_kernel(qs, pts, k=4).orderBy("rank").collect()
        ring = knn_join(qs, pts, k=4, zoom=4).orderBy("rank").collect()
        assert [(r["point_id"], r["rank"]) for r in kern] == \
            [(r["point_id"], r["rank"]) for r in ring]

    def test_no_tie_path_unchanged(self, spark):
        import pandas as pd
        from karta_spark.operators.knn import knn_broadcast_kernel
        rng = np.random.default_rng(7)
        pts = spark.createDataFrame(pd.DataFrame(
            {"point_id": np.arange(50, dtype=np.int64),
             "x": rng.uniform(-5, 5, 50), "y": rng.uniform(-5, 5, 50)}))
        qs = spark.createDataFrame(pd.DataFrame(
            {"query_id": [1, 2], "qx": [0.0, 2.0], "qy": [0.0, -1.0]}))
        out = knn_broadcast_kernel(qs, pts, k=5)
        pdf = out.toPandas()
        assert len(pdf) == 10
        # distances ascend within each query
        for qid, grp in pdf.groupby("query_id"):
            d = grp.sort_values("rank")["dist"].to_numpy()
            assert (np.diff(d) >= 0).all()


class TestShingleHashesSurrogates:
    """ADVICE r4 (low): utf-8 'ignore' encoding can SHRINK below n (lone
    surrogates encode to b''), which made L negative and np.zeros crash."""

    def test_lone_surrogate_text(self):
        from karta_spark.operators.dedup import _shingle_hashes
        out = _shingle_hashes("\ud800\ud801\ud802\ud803\ud804", 3)
        assert isinstance(out, np.ndarray)
        assert out.dtype == np.uint64
        assert len(out) >= 1  # padded NUL gram, not a crash

    def test_empty_and_short_text(self):
        from karta_spark.operators.dedup import _shingle_hashes
        assert len(_shingle_hashes("", 3)) == 1
        assert len(_shingle_hashes("a", 3)) == 1

    def test_normal_text_unchanged(self):
        from karta_spark.operators.dedup import _shingle_hashes
        h1 = _shingle_hashes("hello world", 3)
        h2 = _shingle_hashes("hello world", 3)
        assert np.array_equal(h1, h2)
        assert len(h1) == len(set("hello world"[i:i + 3]
                                  for i in range(len("hello world") - 2)))


class TestPseudoMercatorWkt:
    """ADVICE r4 (low): canonical GDAL/EPSG:3857 WKT (ellipsoidal WGS84
    GEOGCS + Mercator_1SP, all-zero params) must parse as WEB_MERCATOR."""

    # the canonical EPSG:3857 WKT1 as GDAL exports it
    EPSG_3857 = (
        'PROJCS["WGS 84 / Pseudo-Mercator",'
        'GEOGCS["WGS 84",DATUM["WGS_1984",'
        'SPHEROID["WGS 84",6378137,298.257223563,'
        'AUTHORITY["EPSG","7030"]],AUTHORITY["EPSG","6326"]],'
        'PRIMEM["Greenwich",0,AUTHORITY["EPSG","8901"]],'
        'UNIT["degree",0.0174532925199433,AUTHORITY["EPSG","9122"]],'
        'AUTHORITY["EPSG","4326"]],'
        'PROJECTION["Mercator_1SP"],'
        'PARAMETER["central_meridian",0],'
        'PARAMETER["scale_factor",1],'
        'PARAMETER["false_easting",0],'
        'PARAMETER["false_northing",0],'
        'UNIT["metre",1,AUTHORITY["EPSG","9001"]],'
        'AXIS["Easting",EAST],AXIS["Northing",NORTH],'
        'AUTHORITY["EPSG","3857"]]')

    # EPSG:3395 true ellipsoidal Mercator: SAME shape, different name —
    # must still raise (math would be ellipsoidal, not spherical)
    EPSG_3395 = EPSG_3857.replace(
        'PROJCS["WGS 84 / Pseudo-Mercator"',
        'PROJCS["WGS 84 / World Mercator"').replace(
        'AUTHORITY["EPSG","3857"]', 'AUTHORITY["EPSG","3395"]')

    def test_canonical_3857_parses(self):
        from karta_spark.functions import crs
        assert crs.from_wkt(self.EPSG_3857) is crs.WEB_MERCATOR

    def test_own_spherical_roundtrip_still_parses(self):
        from karta_spark.functions import crs
        assert crs.from_wkt(crs.to_wkt(crs.WEB_MERCATOR)) is crs.WEB_MERCATOR

    def test_world_mercator_3395_still_raises(self):
        from karta_spark.functions import crs
        with pytest.raises(ValueError, match="Mercator_1SP"):
            crs.from_wkt(self.EPSG_3395)

    def test_offset_mercator_still_raises(self):
        from karta_spark.functions import crs
        wkt = self.EPSG_3857.replace('PARAMETER["central_meridian",0]',
                                     'PARAMETER["central_meridian",110]')
        with pytest.raises(ValueError, match="Mercator_1SP"):
            crs.from_wkt(wkt)


class TestNgramAutoProbe:
    """ADVICE r4 (low): strategy='auto' must not run a FULL count —
    the probe is bounded by limit(MAX+1)."""

    def test_auto_still_correct_small(self, spark):
        import pandas as pd
        from karta_spark.operators.dedup import ngram_jaccard_pairs
        df = spark.createDataFrame(pd.DataFrame({
            "doc_id": [1, 2, 3],
            "body": ["abcdefg", "abcdefx", "zzzzzzz"]}))
        out = ngram_jaccard_pairs(df, "body", "doc_id", n=3, threshold=0.3)
        rows = {(r["id_a"], r["id_b"]) for r in out.collect()}
        assert rows == {(1, 2)}

    def test_probe_is_bounded(self, spark):
        # the probe plan must contain a GlobalLimit, not a full agg-count
        import pandas as pd
        from karta_spark.operators import dedup
        df = spark.createDataFrame(pd.DataFrame({
            "doc_id": [1], "body": ["abc"]}))
        probe = df.limit(dedup.NGRAM_GROUPED_MAX_DOCS + 1)
        # analyzed plan (optimizer folds the limit into a LocalRelation
        # for in-memory test data; on a real scan it survives as
        # GlobalLimit/LocalLimit and short-circuits the read)
        plan = probe._jdf.queryExecution().analyzed().toString()
        assert "GlobalLimit" in plan

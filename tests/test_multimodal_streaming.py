"""Multimodal transforms + Structured Streaming tests."""

import time

import numpy as np
import pytest
from pyspark.sql import functions as F

from karta_spark.sources import images, multimodal
from karta_spark.streaming import stream_ops
from __spark_entry__ import FLAGSHIP_POLYS


class TestMultimodal:
    def test_resize_roundtrip(self, spark):
        imgs = images.synth_images(spark, 12, partitions=2)
        small = multimodal.resize_images(imgs, 8, 8).collect()
        assert len(small) == 12
        for r in small:
            pix = images.decode_image(bytes(r["bytes"]), r["fmt"])
            assert pix.shape == (8, 8, 3)

    def test_resize_identity(self, spark):
        # resizing to the same shape must be a pixel-exact no-op
        imgs = images.synth_images(spark, 4, partitions=1)
        same = {r["image_id"]: r for r in
                multimodal.resize_images(imgs, 16, 16).collect()}
        for r in imgs.collect():
            orig = images.decode_image(bytes(r["bytes"]), r["fmt"])
            got = images.decode_image(bytes(same[r["image_id"]]["bytes"]), "png")
            assert np.array_equal(orig, got)

    def test_image_features(self, spark):
        imgs = images.synth_images(spark, 10, partitions=2)
        feats = multimodal.image_features(imgs).collect()
        assert len(feats) == 10
        for r in feats:
            assert 0 <= r["mean_r"] <= 255
            assert sum(r["luma_hist"]) == 16 * 16
            assert len(r["embedding"]) == 4 * 4 * 3
            assert all(0.0 <= v <= 1.0 for v in r["embedding"])

    def test_audio_wav_decode(self, spark):
        from karta_spark.sources.av import encode_wav
        t = np.linspace(0, 1, 8000, endpoint=False)
        tone = 0.5 * np.sin(2 * np.pi * 440 * t)             # mono 16-bit
        stereo = np.stack([tone, 0.25 * tone], axis=1)       # stereo f32
        clips = spark.createDataFrame(
            [("mono16", bytearray(encode_wav(tone, 8000, 16))),
             ("st_f32", bytearray(encode_wav(stereo, 8000, "float32"))),
             ("mono8", bytearray(encode_wav(tone, 8000, 8)))],
            "clip_id string, bytes binary")
        got = {r["clip_id"]: r for r in multimodal.decode_audio(clips).collect()}
        assert got["mono16"]["sample_rate"] == 8000
        assert got["mono16"]["n_samples"] == 8000
        # RMS of a 0.5-amplitude sine = 0.5/sqrt(2)
        assert abs(got["mono16"]["rms"] - 0.5 / np.sqrt(2)) < 1e-3
        assert abs(got["mono8"]["rms"] - 0.5 / np.sqrt(2)) < 5e-3
        assert got["st_f32"]["n_samples"] == 8000

    def test_video_mjpeg_frame_sampling(self, spark):
        from karta_spark.sources.av import encode_mjpeg_avi
        rng = np.random.default_rng(4)
        frames = [np.full((16, 16, 3), 10 * k, dtype=np.uint8) for k in range(9)]
        avi = encode_mjpeg_avi(frames, fps=3, quality=95)
        vids = spark.createDataFrame([("v0", bytearray(avi))],
                                     "video_id string, bytes binary")
        got = multimodal.sample_video_frames(vids, every_n=4).collect()
        assert sorted(r["frame_idx"] for r in got) == [0, 4, 8]
        for r in got:
            pix = images.decode_image(bytes(r["frame_png"]), "png")
            want = 10 * r["frame_idx"]
            assert abs(float(pix.mean()) - want) <= 2.0  # jpeg-lossy flat frame

    def test_non_wav_raises(self, spark):
        clips = spark.createDataFrame([("c0", bytearray(b"xx"))],
                                      "clip_id string, bytes binary")
        with pytest.raises(Exception, match="RIFF"):
            multimodal.decode_audio(clips).collect()


class TestStreaming:
    def test_streaming_tile_counts(self, spark, tmp_path):
        # rate source -> derive deterministic points -> flagship stream
        from karta_spark.functions import cells
        rate = (
            spark.readStream.format("rate").option("rowsPerSecond", "100").load()
            .withColumn("phash", (F.col("value") * 2246822519 % F.lit(2 ** 31).cast("long"))
                        * F.lit(2 ** 32).cast("long")
                        + (F.col("value") * 2654435761 % F.lit(2 ** 32).cast("long")))
            .select(F.col("timestamp").alias("ts"),
                    cells.lon_from_phash(F.col("phash")).alias("x"),
                    cells.lat_from_phash(F.col("phash")).alias("y"))
        )
        out = stream_ops.streaming_tile_counts(rate, FLAGSHIP_POLYS, zoom=4,
                                               window="10 seconds",
                                               watermark="10 seconds")
        q = (out.writeStream.outputMode("update").format("memory")
             .queryName("tilecounts")
             .option("checkpointLocation", str(tmp_path / "ck")).start())
        try:
            # poll the sink while micro-batches run on their own trigger:
            # processAllAvailable() on a live rate source CHASES new data
            # and can block for minutes on a cold/loaded box
            deadline = time.time() + 90
            n = 0
            while time.time() < deadline:
                n = spark.sql("SELECT count(*) FROM tilecounts").collect()[0][0]
                if n > 0:
                    break
                time.sleep(1)
            assert n > 0
            rows = spark.sql(
                "SELECT poly_id, sum(n) AS total FROM tilecounts GROUP BY 1").collect()
            assert all(r["poly_id"] in {"heptagon", "north_quad", "east_tri"}
                       for r in rows)
        finally:
            q.stop()

    def test_streaming_matches_batch(self, spark, tmp_path):
        # the same expressions run in batch mode give the same memberships
        from karta_spark.functions import cells
        batch = (
            spark.range(0, 5000)
            .withColumn("phash", (F.col("id") * 2246822519 % F.lit(2 ** 31).cast("long"))
                        * F.lit(2 ** 32).cast("long")
                        + (F.col("id") * 2654435761 % F.lit(2 ** 32).cast("long")))
            .select(cells.lon_from_phash(F.col("phash")).alias("x"),
                    cells.lat_from_phash(F.col("phash")).alias("y"))
        )
        enriched = stream_ops.with_cells_and_polys(batch, FLAGSHIP_POLYS, zoom=4)
        got = {r["poly_id"]: r["n"] for r in
               enriched.where(F.col("poly_id").isNotNull())
               .groupBy("poly_id").agg(F.count("*").alias("n")).collect()}
        # cross-check against the batch PIP join operator
        from karta_spark.operators import pip_join
        want_rows = pip_join.point_in_polygon_join(batch, FLAGSHIP_POLYS, zoom=5)
        # with_cells_and_polys assigns ONE polygon per point (first match);
        # counts per polygon can only exceed in the join form
        want = {r["poly_id"]: r["n"] for r in
                want_rows.groupBy("poly_id").agg(F.count("*").alias("n")).collect()}
        for pid, n in got.items():
            assert n <= want[pid]
        assert sum(got.values()) > 0


class TestStreamingDedup:
    def test_first_arrival_kept_per_key(self, spark, tmp_path):
        import os
        from karta_spark.streaming.stream_ops import streaming_dedup
        src = str(tmp_path / "in")
        os.makedirs(src)
        # micro-batch 1: dups within the batch
        spark.createDataFrame(
            [("k1", "a", "2024-01-01 00:00:00"),
             ("k1", "b", "2024-01-01 00:00:01"),
             ("k2", "c", "2024-01-01 00:00:02")],
            "key string, payload string, ts_s string",
        ).write.mode("overwrite").parquet(src + "/b1")
        stream = (spark.readStream.schema("key string, payload string, ts_s string")
                  .option("maxFilesPerTrigger", "1").parquet(src + "/b1")
                  .withColumn("ts", F.col("ts_s").cast("timestamp")))
        out = streaming_dedup(stream, ["key"])
        q = (out.writeStream.format("memory").queryName("dedup_t")
             .outputMode("append").trigger(availableNow=True).start())
        q.awaitTermination(60)
        rows = spark.sql("SELECT key FROM dedup_t").collect()
        assert sorted(r["key"] for r in rows) == ["k1", "k2"]


class TestStreamingNearDup:
    def test_incremental_minhash_neardup(self, spark, tmp_path):
        """The foreachBatch near-dup sink finds pairs WITHIN a batch, pairs
        against PREVIOUSLY ingested docs (the accumulated bucket store),
        and a replayed batch (at-least-once) is idempotent."""
        root = str(tmp_path / "nd")
        sink = stream_ops.minhash_neardup_sink(
            root, num_perm=64, bands=16, shingle=3, threshold=0.5)
        b1 = spark.createDataFrame(
            [(0, "the quick brown fox jumps over the lazy dog at dawn"),
             (1, "the quick brown fox jumps over the lazy dog at dusk"),
             (2, "completely unrelated database query optimizer content")],
            "doc_id long, text string")
        sink(b1, 0)
        pairs = {(r["id_a"], r["id_b"]) for r in
                 spark.read.parquet(f"{root}/pairs").collect()}
        assert (0, 1) in pairs and all(2 not in p for p in pairs)
        # batch 2: a near-dup of doc 0 arrives later
        b2 = spark.createDataFrame(
            [(5, "the quick brown fox jumps over the lazy dog at dawn!")],
            "doc_id long, text string")
        sink(b2, 1)
        pairs = {(r["id_a"], r["id_b"]) for r in
                 spark.read.parquet(f"{root}/pairs").collect()}
        assert (0, 5) in pairs and (1, 5) in pairs  # cross-batch recall
        # replay batch 2 (foreachBatch retry): byte-identical state — note
        # ROW comparison, not set: a replayed batch whose own docs leak
        # back in via the store fans pairs out into duplicates
        before = sorted((r["id_a"], r["id_b"], r["jaccard"]) for r in
                        spark.read.parquet(f"{root}/pairs").collect())
        sink(b2, 1)
        after = sorted((r["id_a"], r["id_b"], r["jaccard"]) for r in
                       spark.read.parquet(f"{root}/pairs").collect())
        assert after == before
        again = {(a, b) for a, b, _ in after}
        assert again == pairs
        n_buckets = spark.read.parquet(f"{root}/buckets").count()
        assert n_buckets == 16 * 4  # bands x docs, no replay duplication


class TestStreamingPhashNearDup:
    def test_incremental_phash_neardup(self, spark, tmp_path):
        """The image-axis streaming near-dup: in-batch pairs, cross-batch
        pairs through the accumulated bucket store, replay idempotency —
        exact hamming verification over the banded candidates."""
        root = str(tmp_path / "pnd")
        sink = stream_ops.phash_neardup_sink(root, max_hamming=3)
        base = 0x0123456789ABCDEF
        b1 = spark.createDataFrame(
            [("imgA", base), ("imgB", base ^ 0b101),      # hamming 2
             ("imgC", base ^ ((1 << 40) | (1 << 13) | (1 << 7) | (1 << 3)
                              | (1 << 60)))],             # hamming 5
            "image_id string, phash long")
        sink(b1, 0)
        pairs = {(r.id_a, r.id_b): r.hamming for r in
                 spark.read.parquet(f"{root}/pairs").collect()}
        assert pairs == {("imgA", "imgB"): 2}
        # batch 2: near-dup of A arrives later (hamming 1), plus junk
        b2 = spark.createDataFrame(
            [("imgD", base ^ (1 << 33)), ("imgE", ~base)],
            "image_id string, phash long")
        sink(b2, 1)
        pairs = {(r.id_a, r.id_b): r.hamming for r in
                 spark.read.parquet(f"{root}/pairs").collect()}
        assert pairs[("imgA", "imgD")] == 1
        assert pairs[("imgB", "imgD")] == 3
        assert all("imgE" not in k and "imgC" not in k for k in pairs)
        # replay batch 2: byte-identical state
        before = sorted((r.id_a, r.id_b, r.hamming) for r in
                        spark.read.parquet(f"{root}/pairs").collect())
        sink(b2, 1)
        after = sorted((r.id_a, r.id_b, r.hamming) for r in
                       spark.read.parquet(f"{root}/pairs").collect())
        assert after == before
        assert spark.read.parquet(f"{root}/buckets").count() == 4 * 5

    def test_live_stream_with_rate_source(self, spark, tmp_path):
        """End-to-end through a real writeStream: rate-source rows mapped
        to phashes where consecutive ids collide within hamming 1."""
        import time
        from pyspark.sql import functions as F
        root = str(tmp_path / "live")
        ckpt = str(tmp_path / "ckpt")
        stream = (spark.readStream.format("rate")
                  .option("rowsPerSecond", 50).load()
                  .select(F.concat(F.lit("img"),
                                   (F.col("value") / 2).cast("long")
                                   .cast("string")).alias("image_id_base"),
                          F.col("value"))
                  .select(F.concat(F.col("image_id_base"), F.lit("_"),
                                   F.pmod(F.col("value"), F.lit(2))
                                   .cast("string")).alias("image_id"),
                          (F.xxhash64((F.col("value") / 2).cast("long"))
                           .bitwiseXOR(F.pmod(F.col("value"), F.lit(2))))
                          .alias("phash")))  # hash spreads bases far apart;
                                             # only the low-bit twin is near
        q = stream_ops.streaming_phash_neardup(stream, root, ckpt,
                                               max_hamming=2)
        try:
            deadline = time.time() + 30
            found = False
            while time.time() < deadline and not found:
                time.sleep(2)
                try:
                    n = spark.read.parquet(f"{root}/pairs").count()
                    found = n > 0
                except Exception:
                    pass
            assert found, "no near-dup pairs surfaced from the live stream"
            rows = spark.read.parquet(f"{root}/pairs").collect()
            for r in rows:
                # pairs are img{k}_0 vs img{k}_1 (same base, low bit flip)
                assert r.id_a.split("_")[0] == r.id_b.split("_")[0]
                assert r.hamming == 1
        finally:
            q.stop()


class TestStreamingUrlDedup:
    def test_variants_collapse_to_one(self, spark, tmp_path):
        import os
        from karta_spark.streaming.stream_ops import streaming_url_dedup
        src = str(tmp_path / "u_in")
        os.makedirs(src)
        spark.createDataFrame(
            [("https://Example.com:443/a/?id=1&utm_source=x", "2024-01-01 00:00:00"),
             ("https://example.com/a?id=1", "2024-01-01 00:00:01"),
             ("HTTPS://EXAMPLE.COM/a//?id=1#frag", "2024-01-01 00:00:02"),
             ("https://example.com/b", "2024-01-01 00:00:03")],
            "url string, ts_s string",
        ).write.mode("overwrite").parquet(src + "/b1")
        stream = (spark.readStream.schema("url string, ts_s string")
                  .option("maxFilesPerTrigger", "1").parquet(src + "/b1")
                  .withColumn("ts", F.col("ts_s").cast("timestamp")))
        out = streaming_url_dedup(stream)
        q = (out.writeStream.format("memory").queryName("url_dedup_t")
             .outputMode("append").trigger(availableNow=True).start())
        q.awaitTermination(60)
        rows = spark.sql(
            "SELECT canonical_url FROM url_dedup_t").collect()
        got = sorted(r["canonical_url"] for r in rows)
        assert got == ["https://example.com/a?id=1",
                       "https://example.com/b"]

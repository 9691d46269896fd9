"""Structured Streaming operators.

The reference is strictly batch (SURVEY §2.9) and the north rule's
streaming-shaped requirement — resumable stages with lineage — is covered by
plans.lineage. This module adds the genuinely-streaming counterparts so the
engine also serves continuous ingest:

- ``streaming_tile_counts``: the flagship pipeline as a stream — cell
  encode + PIP + tile assign over a streaming image/point source with
  event-time watermarks and windowed counts.
- ``streaming_sessionize``: session windows over an event stream
  (the streaming twin of q31).
- ``run_foreach_batch_checkpoint``: foreachBatch sink writing parquet
  stages through plans.lineage, so a killed stream resumes from its
  checkpoint without recomputation.

All transformations are the same Catalyst expressions as the batch path —
one definition, two execution modes.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from karta_spark.functions import cells
from karta_spark.operators.pip_join import PolygonSpec, _expr_able, polygon_contains_col


def with_cells_and_polys(stream: DataFrame, polys: list[PolygonSpec],
                         zoom: int = 8, lon: str = "x", lat: str = "y") -> DataFrame:
    """Attach tile ids and polygon membership to a (possibly streaming)
    point DataFrame using only expression-compilable polygons (streaming
    plans shouldn't carry driver-collected covers)."""
    out = stream.withColumn("tile", cells.tile_id(F.col(lon), F.col(lat), zoom))
    match = F.lit(None).cast("string")
    for p in reversed([p for p in polys if _expr_able(p)]):
        match = F.when(polygon_contains_col(p, lon, lat),
                       F.lit(p.poly_id)).otherwise(match)
    return out.withColumn("poly_id", match)


def streaming_tile_counts(stream: DataFrame, polys: list[PolygonSpec],
                          zoom: int = 8, window: str = "1 minute",
                          watermark: str = "2 minutes",
                          ts_col: str = "ts") -> DataFrame:
    """Windowed per-(polygon, tile) counts with late-data watermarking."""
    enriched = with_cells_and_polys(stream, polys, zoom)
    return (
        enriched.where(F.col("poly_id").isNotNull())
        .withWatermark(ts_col, watermark)
        .groupBy(F.window(ts_col, window), "poly_id", "tile")
        .agg(F.count("*").alias("n"))
    )


def streaming_sessionize(stream: DataFrame, gap: str = "30 minutes",
                         ts_col: str = "ts", user_col: str = "user_id") -> DataFrame:
    """Session windows (inactivity gap) over an event stream —
    session_window + watermark (the streaming twin of batch q31)."""
    return (
        stream.withWatermark(ts_col, gap)
        .groupBy(F.session_window(ts_col, gap), user_col)
        .agg(F.count("*").alias("n_events"))
    )


def run_foreach_batch_checkpoint(query_df: DataFrame, root: str, stage: str,
                                 checkpoint_dir: str):
    """Start the stream with a foreachBatch sink that appends each
    micro-batch as parquet under <root>/<stage>/data; Spark's streaming
    checkpoint (offsets + state) makes the whole pipeline resumable."""
    import os

    def sink(batch_df: DataFrame, batch_id: int):
        batch_df.write.mode("append").parquet(os.path.join(root, stage, "data"))

    return (
        query_df.writeStream.outputMode("append")
        .option("checkpointLocation", checkpoint_dir)
        .foreachBatch(sink)
        .start()
    )


def streaming_dedup(stream: DataFrame, keys: list[str], ts_col: str = "ts",
                    watermark: str = "10 minutes") -> DataFrame:
    """Streaming exact dedup: keep the first arrival per key, with a
    watermark bounding the dedup state (keys older than the watermark are
    evicted — the streaming twin of dedup.exact_dedup, and the shape every
    continuous-ingest training pipeline needs in front of its sinks)."""
    return stream.withWatermark(ts_col, watermark) \
                 .dropDuplicatesWithinWatermark(keys)


def minhash_neardup_sink(root: str, text_col: str = "text", id_col: str = "doc_id",
                         num_perm: int = 64, bands: int = 16, shingle: int = 3,
                         threshold: float = 0.5, seed: int = 42):
    """foreachBatch sink for continuous NEAR-dup detection — the streaming
    twin of dedup.minhash_lsh_pairs.

    Per micro-batch: banded MinHash buckets of the new docs are equi-joined
    against the ACCUMULATED bucket store (parquet under <root>/buckets —
    O(bands) rows per doc ever ingested, compacted columnar storage rather
    than executor memory, so state scales to the corpus, not the cluster
    RAM), plus the in-batch self-join; candidates are verified with exact
    n-gram Jaccard against the docs store and appended to <root>/pairs.

    Restart-safe: every write lands under batch_id=N subdirectories with
    overwrite mode, so a replayed batch (foreachBatch's at-least-once
    contract) is idempotent."""
    from karta_spark.operators import dedup as _dedup

    def sink(batch_df: DataFrame, batch_id: int) -> None:
        spark = batch_df.sparkSession
        new_docs = batch_df.select(F.col(id_col).alias("id"),
                                   F.col(text_col).alias("t"))
        if not new_docs.take(1):
            return
        new_docs = new_docs.localCheckpoint(eager=True)
        banded = _dedup.banded_minhash(
            batch_df, text_col, id_col, num_perm, bands, shingle, seed
        ).localCheckpoint(eager=True)

        def _read(sub, cols):
            """Store rows from batches BEFORE this one.

            Excluding batch_id == batch_id matters for replay: a failed
            attempt already wrote this batch's rows, and re-reading them
            would duplicate every cross-batch pair through the texts join.
            Only a missing store (the first batch) maps to None — any
            other read failure must surface, or all pairs against earlier
            batches would silently vanish for this batch."""
            from pyspark.errors import AnalysisException
            try:
                df = spark.read.parquet(f"{root}/{sub}")
            except AnalysisException as e:
                if "PATH_NOT_FOUND" in str(e) or "Path does not exist" in str(e):
                    return None
                raise
            return df.where(F.col("batch_id") != batch_id).select(*cols)

        store = _read("buckets", ["id", "band", "bucket"])
        old_docs = _read("docs", ["id", "t"])
        nb = banded.alias("n")
        pairs_new_new = (
            nb.join(banded.alias("m"),
                    (F.col("n.band") == F.col("m.band"))
                    & (F.col("n.bucket") == F.col("m.bucket"))
                    & (F.col("n.id") < F.col("m.id")))
            .select(F.col("n.id").alias("id_a"), F.col("m.id").alias("id_b")))
        cand = pairs_new_new
        if store is not None:
            pairs_new_old = (
                nb.join(store.alias("o"),
                        (F.col("n.band") == F.col("o.band"))
                        & (F.col("n.bucket") == F.col("o.bucket"))
                        # a replayed batch sees its own buckets in the
                        # store (at-least-once) — never self-pair
                        & (F.col("n.id") != F.col("o.id")))
                .select(F.least("n.id", "o.id").alias("id_a"),
                        F.greatest("n.id", "o.id").alias("id_b")))
            cand = cand.unionByName(pairs_new_old)
        cand = cand.distinct()
        texts = new_docs if old_docs is None else new_docs.unionByName(old_docs)
        joined = (
            cand.join(texts.select(F.col("id").alias("id_a"), F.col("t").alias("t_a")), "id_a")
                .join(texts.select(F.col("id").alias("id_b"), F.col("t").alias("t_b")), "id_b"))
        sh_a = F.array_distinct(F.expr(
            f"transform(sequence(1, greatest(length(t_a)-{shingle - 1}, 1)),"
            f" i -> substring(t_a, i, {shingle}))"))
        sh_b = F.array_distinct(F.expr(
            f"transform(sequence(1, greatest(length(t_b)-{shingle - 1}, 1)),"
            f" i -> substring(t_b, i, {shingle}))"))
        inter = F.size(F.array_intersect(sh_a, sh_b))
        union = F.size(sh_a) + F.size(sh_b) - inter
        pairs = (joined
                 .withColumn("jaccard", inter.cast("double") / union)
                 .where(F.col("jaccard") >= threshold)
                 .select("id_a", "id_b", "jaccard"))
        pairs.write.mode("overwrite").parquet(f"{root}/pairs/batch_id={batch_id}")
        banded.write.mode("overwrite").parquet(f"{root}/buckets/batch_id={batch_id}")
        new_docs.write.mode("overwrite").parquet(f"{root}/docs/batch_id={batch_id}")

    return sink


def streaming_minhash_neardup(stream: DataFrame, root: str, checkpoint_dir: str,
                              text_col: str = "text", id_col: str = "doc_id",
                              **kw):
    """Wire minhash_neardup_sink into a writeStream (see the sink for the
    state/idempotency story)."""
    return (
        stream.writeStream
        .option("checkpointLocation", checkpoint_dir)
        .foreachBatch(minhash_neardup_sink(root, text_col, id_col, **kw))
        .start()
    )


# ---------------------------------------------------------------------------
# custom stateful operator: streaming per-stratum reservoir sampling
# (applyInPandasWithState — the escape hatch for state shapes the
# declarative API cannot express; BASELINE.md names it for exactly this)
# ---------------------------------------------------------------------------

def streaming_reservoir_sample(
    stream: DataFrame, keys: list[str], id_col: str, k: int,
    seed: int = 7, payload_cols: list[str] | None = None,
):
    """Uniform reservoir of at most *k* rows per stratum over an unbounded
    stream — the streaming twin of text.stratified_sample, as a CUSTOM
    STATEFUL operator (applyInPandasWithState): per-group state holds
    (n_seen, reservoir rows); each micro-batch runs classic Algorithm R
    with a DETERMINISTIC acceptance index (blake2b of seed+id+n, not an
    RNG), so a replayed batch sequence reproduces the identical reservoir
    and tests can pin exact contents.  State is O(k) rows per stratum —
    no per-event state growth, the property that makes it safe on an
    unbounded corpus.  Emits the full current reservoir per group each
    batch (outputMode update).

    Built-ins cannot express this: dropDuplicates keeps ALL keys,
    windowed aggs cannot hold arbitrary row payloads with replacement
    semantics, and sampling transforms are stateless per batch."""
    import hashlib
    import pickle
    import pandas as pd
    from pyspark.sql.streaming.state import GroupStateTimeout
    from pyspark.sql.types import (BinaryType, LongType, StructField,
                                   StructType)

    payload_cols = payload_cols or [id_col]
    out_fields = [stream.schema[c] for c in keys] + \
                 [stream.schema[c] for c in payload_cols] + \
                 [StructField("n_seen", LongType())]
    out_schema = StructType(out_fields)
    state_schema = StructType([StructField("n", LongType()),
                               StructField("blob", BinaryType())])

    def fn(key, pdf_iter, state):
        if state.exists:
            n, blob = state.get
            res = pickle.loads(bytes(blob))
        else:
            n, res = 0, []
        id_idx = payload_cols.index(id_col)
        for pdf in pdf_iter:
            for row in pdf[payload_cols].itertuples(index=False, name=None):
                n += 1
                if len(res) < k:
                    res.append(row)
                else:
                    # deterministic Algorithm R: j ~ U[0, n) from a hash
                    # of (seed, id, n) — replay-identical, uniform
                    h = hashlib.blake2b(
                        f"{seed}|{row[id_idx]}|{n}".encode(),
                        digest_size=8).digest()
                    j = int.from_bytes(h, "big") % n
                    if j < k:
                        res[j] = row
        state.update((n, pickle.dumps(res)))
        yield pd.DataFrame(
            [key + r + (n,) for r in res],
            columns=list(keys) + payload_cols + ["n_seen"])

    return stream.groupBy(*keys).applyInPandasWithState(
        fn, out_schema, state_schema, "update",
        GroupStateTimeout.NoTimeout)


def phash_neardup_sink(root: str, id_col: str = "image_id",
                       phash_col: str = "phash", max_hamming: int = 3):
    """foreachBatch sink for continuous IMAGE near-dup detection — the
    streaming twin of dedup.hamming_near_pairs over the input table's
    64-bit phash column.

    Per micro-batch: pigeonhole band keys (bands = max_hamming + 1, the
    recall-complete split) of the new images equi-join the ACCUMULATED
    bucket store under <root>/buckets (O(bands) rows per image ever
    ingested — columnar state, not executor memory) plus the in-batch
    self-join; candidates verify with exact popcount hamming.  Unlike
    the text sink no second store is needed: the signature travels in
    the bucket rows, so verification is join-free.

    Restart-safe the same way: per-batch subdirectories written with
    overwrite, replayed batches excluded from the store read."""
    n_bands = max_hamming + 1
    base, extra = divmod(64, n_bands)
    widths = [base + (1 if i < extra else 0) for i in range(n_bands)]
    offsets = [sum(widths[:i]) for i in range(n_bands)]

    def sink(batch_df: DataFrame, batch_id: int) -> None:
        spark = batch_df.sparkSession
        src = batch_df.select(F.col(id_col).alias("id"),
                              F.col(phash_col).alias("_sig"))
        if not src.take(1):
            return
        banded = src.select(
            "id", "_sig",
            F.explode(F.array(*[
                F.struct(F.lit(i).alias("band"),
                         F.shiftrightunsigned("_sig", offsets[i])
                         .bitwiseAND(F.lit((1 << widths[i]) - 1)).alias("key"))
                for i in range(n_bands)
            ])).alias("bb"),
        ).select("id", "_sig", "bb.band", "bb.key").localCheckpoint(eager=True)

        from pyspark.errors import AnalysisException
        try:
            store = spark.read.parquet(f"{root}/buckets")
            store = store.where(F.col("batch_id") != batch_id) \
                         .select("id", "_sig", "band", "key")
        except AnalysisException as e:
            if "PATH_NOT_FOUND" in str(e) or "Path does not exist" in str(e):
                store = None
            else:
                raise

        nb = banded.alias("n")
        cand = (nb.join(banded.alias("m"),
                        (F.col("n.band") == F.col("m.band"))
                        & (F.col("n.key") == F.col("m.key"))
                        & (F.col("n.id") < F.col("m.id")))
                .select(F.col("n.id").alias("id_a"), F.col("m.id").alias("id_b"),
                        F.col("n._sig").alias("sig_a"), F.col("m._sig").alias("sig_b")))
        if store is not None:
            old = (nb.join(store.alias("o"),
                           (F.col("n.band") == F.col("o.band"))
                           & (F.col("n.key") == F.col("o.key"))
                           # replayed batches see their own buckets
                           & (F.col("n.id") != F.col("o.id")))
                   .select(F.least("n.id", "o.id").alias("id_a"),
                           F.greatest("n.id", "o.id").alias("id_b"),
                           F.when(F.col("n.id") < F.col("o.id"), F.col("n._sig"))
                           .otherwise(F.col("o._sig")).alias("sig_a"),
                           F.when(F.col("n.id") < F.col("o.id"), F.col("o._sig"))
                           .otherwise(F.col("n._sig")).alias("sig_b")))
            cand = cand.unionByName(old)
        hamming = F.bit_count(F.col("sig_a").bitwiseXOR(F.col("sig_b")))
        pairs = (cand.distinct()
                 .withColumn("hamming", hamming)
                 .where(F.col("hamming") <= max_hamming)
                 .select("id_a", "id_b", "hamming"))
        pairs.write.mode("overwrite").parquet(f"{root}/pairs/batch_id={batch_id}")
        banded.write.mode("overwrite").parquet(f"{root}/buckets/batch_id={batch_id}")

    return sink


def streaming_phash_neardup(stream: DataFrame, root: str, checkpoint_dir: str,
                            id_col: str = "image_id",
                            phash_col: str = "phash", **kw):
    """Wire phash_neardup_sink into a writeStream (see the sink for the
    state/idempotency story)."""
    return (
        stream.writeStream
        .option("checkpointLocation", checkpoint_dir)
        .foreachBatch(phash_neardup_sink(root, id_col, phash_col, **kw))
        .start()
    )


def streaming_url_dedup(stream: DataFrame, url_col: str = "url",
                        ts_col: str = "ts",
                        watermark: str = "10 minutes") -> DataFrame:
    """Crawl-frontier dedup: canonicalize URLs (text.canonical_url —
    case/port/slash/tracking-param/fragment normalization, pure
    Catalyst) and keep the first arrival per canonical form, with the
    watermark bounding state exactly like ``streaming_dedup``.  The
    streaming twin of the batch q76 dedup key; at crawl scale the state
    store holds one entry per canonical URL inside the watermark
    horizon."""
    from karta_spark.operators.text import canonical_url
    canon = stream.withColumn("canonical_url",
                              canonical_url(F.col(url_col)))
    return canon.withWatermark(ts_col, watermark) \
                .dropDuplicatesWithinWatermark(["canonical_url"])

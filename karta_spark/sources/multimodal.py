"""Multimodal column transforms: images/audio/video as opaque binary
columns with typed metadata, processed by Arrow-batched kernels.

All real, pure numpy — no external codec libs needed:
- ``resize_images``      — nearest-neighbor resample of decoded pixels,
                           re-encoded lossless
- ``image_features``     — per-image stats + 8-bin luminance histogram +
                           a tiny average-pool embedding (array<float>)
- ``decode_audio``       — WAV PCM/float decode (sources/av.py); soundfile
                           substitutes when importable (adds mp3/ogg/flac)
- ``sample_video_frames``— MJPEG-in-AVI frame sampling through the
                           baseline JPEG decoder; inter-frame codecs
                           (h264...) still require PyAV.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.types import (
    ArrayType, BinaryType, DoubleType, FloatType, IntegerType, LongType,
    StringType, StructField, StructType,
)

from karta_spark.sources.images import decode_image, encode_bmp, encode_png

RESIZED_SCHEMA = StructType([
    StructField("image_id", StringType()),
    StructField("bytes", BinaryType()),
    StructField("w", IntegerType()),
    StructField("h", IntegerType()),
    StructField("fmt", StringType()),
])

FEATURES_SCHEMA = StructType([
    StructField("image_id", StringType()),
    StructField("mean_r", DoubleType()),
    StructField("mean_g", DoubleType()),
    StructField("mean_b", DoubleType()),
    StructField("luma_std", DoubleType()),
    StructField("luma_hist", ArrayType(LongType())),
    StructField("embedding", ArrayType(FloatType())),
])


def resize_nearest(pix: np.ndarray, w: int, h: int) -> np.ndarray:
    """Nearest-neighbor resize (same index convention as raster
    sample_nearest: source index = round(center position))."""
    sh, sw = pix.shape[:2]
    ii = np.clip(np.round((np.arange(h) + 0.5) * sh / h - 0.5).astype(int), 0, sh - 1)
    jj = np.clip(np.round((np.arange(w) + 0.5) * sw / w - 0.5).astype(int), 0, sw - 1)
    return pix[np.ix_(ii, jj)]


def resize_images(images: DataFrame, w: int, h: int, fmt: str = "png") -> DataFrame:
    """Decode -> nearest resize -> lossless re-encode, one Arrow pass."""
    enc = encode_png if fmt == "png" else encode_bmp

    def run(pdf_iter):
        for pdf in pdf_iter:
            rows = []
            for iid, raw, f0 in zip(pdf["image_id"].to_numpy(),
                                    pdf["bytes"].to_numpy(), pdf["fmt"].to_numpy()):
                pix = decode_image(bytes(raw), f0)
                if pix.ndim == 2:
                    pix = np.repeat(pix[:, :, None], 3, axis=2)
                out = resize_nearest(pix, w, h)
                rows.append((iid, bytearray(enc(out)), w, h, fmt))
            yield pd.DataFrame(rows, columns=[f.name for f in RESIZED_SCHEMA.fields])

    return images.mapInPandas(run, RESIZED_SCHEMA)


def image_features(images: DataFrame, pool: int = 4) -> DataFrame:
    """Decode + channel means, luminance std, 8-bin histogram, and a
    pool x pool x 3 average-pool embedding (the brute-force ANN input)."""
    def run(pdf_iter):
        for pdf in pdf_iter:
            rows = []
            for iid, raw, f0 in zip(pdf["image_id"].to_numpy(),
                                    pdf["bytes"].to_numpy(), pdf["fmt"].to_numpy()):
                pix = decode_image(bytes(raw), f0).astype(np.float64)
                if pix.ndim == 2:
                    pix = np.repeat(pix[:, :, None], 3, axis=2)
                luma = pix @ np.array([0.299, 0.587, 0.114])
                hist = np.histogram(luma, bins=8, range=(0, 256))[0]
                emb = resize_nearest(pix, pool, pool).ravel() / 255.0
                rows.append((
                    iid, float(pix[:, :, 0].mean()),
                    float(pix[:, :, 1].mean()), float(pix[:, :, 2].mean()),
                    float(luma.std()), hist.astype(np.int64).tolist(),
                    emb.astype(np.float32).tolist(),
                ))
            yield pd.DataFrame(rows, columns=[f.name for f in FEATURES_SCHEMA.fields])

    return images.mapInPandas(run, FEATURES_SCHEMA)


def image_quality_stats(images: DataFrame, bytes_col: str = "bytes",
                        id_col: str = "image_id",
                        fmt_col: str = "fmt") -> DataFrame:
    """Corpus-filtering statistics per image (the LAION-style quality
    gate for image training data): dimensions + aspect, mean/std of
    integer luma (brightness/contrast), Laplacian variance over the
    interior (the standard blur metric — low variance = blurry), and
    8-bit luma histogram entropy (flat/synthetic-image detector).
    Arrow-batched decode; integer luma (the BT.601 sum in int64) keeps
    mean/std exactly reproducible across engines."""
    schema = (f"{id_col} string, width int, height int, aspect double, "
              "mean_luma double, std_luma double, laplacian_var double, "
              "entropy double")

    def run(pdf_iter):
        for pdf in pdf_iter:
            rows = []
            for iid, raw, f0 in zip(pdf[id_col].to_numpy(),
                                    pdf[bytes_col].to_numpy(),
                                    pdf[fmt_col].to_numpy()):
                pix = decode_image(bytes(raw), f0)
                if pix.ndim == 2:
                    pix = np.repeat(pix[:, :, None], 3, axis=2)
                h, w = pix.shape[:2]
                # integer BT.601 luma (x1000) — exact in int64, so the
                # moments match a SQL twin bit-for-bit after /1000
                p = pix.astype(np.int64)
                luma = (299 * p[:, :, 0] + 587 * p[:, :, 1]
                        + 114 * p[:, :, 2])
                lsum = int(luma.sum())
                lsq = int((luma * luma).sum())
                n = h * w
                # multiplication (not **2) so a SQL twin can reproduce
                # the identical IEEE op sequence
                mean = lsum / n / 1000.0
                var = (lsq / n - (lsum / n) * (lsum / n)) / 1e6
                lap = (4 * luma[1:-1, 1:-1] - luma[:-2, 1:-1]
                       - luma[2:, 1:-1] - luma[1:-1, :-2]
                       - luma[1:-1, 2:])
                ni = lap.size
                lap_var = 0.0
                if ni:
                    s1, s2 = int(lap.sum()), int((lap * lap).sum())
                    lap_var = (s2 / ni - (s1 / ni) * (s1 / ni)) / 1e6
                lum8 = luma // 1000
                hist = np.bincount(lum8.ravel(), minlength=256)
                pnz = hist[hist > 0] / n
                entropy = float(-(pnz * np.log2(pnz)).sum())
                rows.append((iid, w, h, w / h, mean,
                             float(np.sqrt(max(var, 0.0))), lap_var,
                             entropy))
            yield pd.DataFrame(rows, columns=[
                id_col, "width", "height", "aspect", "mean_luma",
                "std_luma", "laplacian_var", "entropy"])

    return images.mapInPandas(run, schema)


AUDIO_SCHEMA = StructType([
    StructField("clip_id", StringType()),
    StructField("sample_rate", IntegerType()),
    StructField("n_samples", LongType()),
    StructField("rms", DoubleType()),
])


def decode_audio(clips: DataFrame, bytes_col: str = "bytes",
                 id_col: str = "clip_id") -> DataFrame:
    """Arrow-batched audio decode: WAV (PCM 8/16/32-bit + float32, any
    channel count) via the pure-python codec in sources/av.py and FLAC
    (sources/flac.py, sniffed on the fLaC magic — decoded samples are
    rescaled to [-1, 1] like the float WAV path); `soundfile` is used
    instead when importable (adds mp3/ogg).  Per clip: sample rate,
    sample count, RMS level."""
    try:  # pragma: no cover - not present in this container
        import soundfile
        _HAS_SF = True
    except ImportError:
        _HAS_SF = False

    from karta_spark.sources.av import decode_wav
    from karta_spark.sources.flac import decode_flac

    def run(pdf_iter):
        import io
        for pdf in pdf_iter:
            rows = []
            for _, r in pdf.iterrows():
                raw = bytes(r[bytes_col])
                if raw[:4] == b"fLaC":
                    ints, sr, bits = decode_flac(raw)
                    data = ints.astype(np.float64) / float(2 ** (bits - 1))
                elif _HAS_SF:  # pragma: no cover
                    data, sr = soundfile.read(io.BytesIO(raw))
                else:
                    data, sr = decode_wav(raw)
                rows.append((r[id_col], int(sr), len(data),
                             float(np.sqrt(np.mean(np.square(data))))))
            yield pd.DataFrame(rows, columns=[f.name for f in AUDIO_SCHEMA.fields])

    return clips.mapInPandas(run, AUDIO_SCHEMA)


FRAME_SCHEMA = StructType([
    StructField("video_id", StringType()),
    StructField("frame_idx", IntegerType()),
    StructField("frame_png", BinaryType()),
])


def sample_video_frames(videos: DataFrame, every_n: int = 30,
                        bytes_col: str = "bytes",
                        id_col: str = "video_id") -> DataFrame:
    """Arrow-batched frame sampling: every_n-th frame re-encoded as PNG.

    MJPEG-in-AVI streams decode with the pure-python RIFF parser + baseline
    JPEG decoder in sources/av.py — real lossy video end-to-end with zero
    external deps.  Inter-frame codecs (h264 etc.) need PyAV, which is used
    instead when importable."""
    try:  # pragma: no cover - not present in this container
        import av as _pyav  # noqa: F401
        raise NotImplementedError(
            "PyAV frame path not wired in this container build; "
            "MJPEG-AVI is the supported zero-dep format")
    except ImportError:
        pass

    from karta_spark.sources.av import iter_mjpeg_frames

    def run(pdf_iter):
        for pdf in pdf_iter:
            rows = []
            for _, r in pdf.iterrows():
                for idx, frame in iter_mjpeg_frames(bytes(r[bytes_col])):
                    if idx % every_n == 0:
                        rows.append((r[id_col], int(idx),
                                     bytearray(encode_png(frame))))
            yield pd.DataFrame(rows, columns=[f.name for f in FRAME_SCHEMA.fields])

    return videos.mapInPandas(run, FRAME_SCHEMA)


# ---------------------------------------------------------------------------
# robust mixed-format ingest — crawl corpora interleave formats and ship
# plenty of corrupt bytes; the ingest step sniffs magic numbers and must
# fail CLEANLY (a status row, never a crashed task).
# ---------------------------------------------------------------------------

def sniff_format(data: bytes) -> str | None:
    """Magic-number sniff: png/apng, gif, webp, jpeg, bmp, ico, tiff,
    or None when unrecognized."""
    if data[:8] == b"\x89PNG\r\n\x1a\n":
        return "png"
    if data[:6] in (b"GIF87a", b"GIF89a"):
        return "gif"
    if data[:4] == b"RIFF" and data[8:12] == b"WEBP":
        return "webp"
    if data[:2] == b"\xff\xd8":
        return "jpeg"
    if data[:2] == b"BM":
        return "bmp"
    if data[:4] in (b"II*\x00", b"MM\x00*"):
        return "tiff"
    if len(data) >= 6 and data[:4] == b"\x00\x00\x01\x00":
        return "ico"
    return None


def decode_any(data: bytes):
    """Sniff + decode; returns ``(fmt, array_or_None, error_or_None)``.
    Never raises — malformed bytes yield ``(fmt, None, "reason")``, the
    crawl-scale contract (one bad blob must not kill a 10^9-row task).
    ICO decodes to the FIRST directory entry's RGBA."""
    data = bytes(data)
    fmt = sniff_format(data)
    if fmt is None:
        return None, None, "unknown format"
    try:
        if fmt == "ico":
            from karta_spark.sources.ico import decode_ico
            return fmt, decode_ico(data)[0]["rgba"], None
        if fmt == "tiff":
            raise NotImplementedError(
                "plain TIFF rasters go through sources/geotiff.py")
        return fmt, decode_image(data, fmt), None
    except Exception as exc:  # noqa: BLE001 — the contract IS catch-all
        return fmt, None, f"{type(exc).__name__}: {exc}"

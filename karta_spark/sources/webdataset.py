"""WebDataset tar-shard reader/writer — multimodal training's standard
sample container.

Large image/text training runs consume `.tar` shards where each sample
is a group of files sharing a basename key (`000123.jpg`,
`000123.txt`, `000123.json`); loaders stream shards sequentially.
This module implements the convention (stdlib tarfile):

- ``write_shard(samples)`` — deterministic POSIX-tar bytes, one member
  per (key, extension) pair, samples kept contiguous (the WebDataset
  ordering contract).
- ``parse_shard(data)`` — group members by key -> one dict per sample.
- ``read_webdataset_distributed(spark, path)`` — `binaryFile` scan +
  ``mapInPandas``: one task per shard, the production shape (a run
  reads thousands of shards; no driver bytes).  Rows are the
  multimodal-column convention: binary payloads + typed metadata, one
  row per sample with one column per extension.

The reference has no multimodal container layer (beyond-reference op).
"""

from __future__ import annotations

import io
import posixpath
import tarfile

import pandas as pd
from pyspark.sql import DataFrame, SparkSession


def write_shard(samples: list[dict], *, keys: list[str] | None = None) -> bytes:
    """Serialize samples to a WebDataset tar shard.

    Each sample dict maps extension -> bytes (e.g. ``{"jpg": ...,
    "txt": ...}``); ``keys`` gives explicit basenames (default:
    zero-padded sample index).  Members of one sample are written
    contiguously, extensions sorted — the layout webdataset's writer
    produces."""
    buf = io.BytesIO()
    with tarfile.open(fileobj=buf, mode="w", format=tarfile.USTAR_FORMAT) as tf:
        for i, s in enumerate(samples):
            key = keys[i] if keys else f"{i:06d}"
            for ext in sorted(s):
                payload = bytes(s[ext])
                info = tarfile.TarInfo(name=f"{key}.{ext}")
                info.size = len(payload)
                info.mtime = 0  # deterministic fixtures
                tf.addfile(info, io.BytesIO(payload))
    return buf.getvalue()


def parse_shard(data: bytes) -> list[dict]:
    """Group tar members by basename key.  Returns one dict per sample:
    ``{"__key__": key, ext: bytes, ...}`` in first-appearance order.
    The key is the basename up to the FIRST period (webdataset's rule),
    so ``a.seg.png`` groups with ``a.jpg`` under key ``a`` with
    extension ``seg.png``."""
    out: dict[str, dict] = {}
    try:
        tf_ctx = tarfile.open(fileobj=io.BytesIO(data))
    except tarfile.TarError as exc:
        raise ValueError(f"corrupt tar shard: {exc}") from exc
    with tf_ctx as tf:
        for m in tf:
            if not m.isfile():
                continue
            base = posixpath.basename(m.name)
            key, dot, ext = base.partition(".")
            if not dot:
                key, ext = base, ""
            dirpart = posixpath.dirname(m.name)
            if dirpart:
                key = f"{dirpart}/{key}"
            sample = out.setdefault(key, {"__key__": key})
            sample[ext] = tf.extractfile(m).read()
    return list(out.values())


def read_webdataset_distributed(spark: SparkSession, path: str,
                                extensions: tuple = ("jpg", "txt"),
                                on_error: str = "fail") -> DataFrame:
    """One task per shard: `binaryFile` scan + mapInPandas grouping.
    Returns ``shard string, key string`` plus one BINARY column per
    requested extension (NULL when a sample lacks it)."""
    schema = ("shard string, key string, "
              + ", ".join(f"`{e}` binary" for e in extensions))
    files = spark.read.format("binaryFile").load(path) \
        .select("path", "content")

    def run(batches):
        for pdf in batches:
            rows = []
            for p, content in zip(pdf["path"], pdf["content"]):
                try:
                    shard = parse_shard(bytes(content))
                except ValueError:
                    if on_error == "skip":
                        continue
                    raise
                for s in shard:
                    rows.append((p, s["__key__"],
                                 *[bytearray(s[e]) if e in s else None
                                   for e in extensions]))
            yield pd.DataFrame(rows, columns=["shard", "key",
                                              *extensions])

    return files.mapInPandas(run, schema)

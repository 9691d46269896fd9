"""ZIP shard reader/writer — the other container training corpora ship
in (image dumps, Kaggle-style datasets, document archives).

Same sample convention as WebDataset tar shards (sources/webdataset.py):
members grouped by basename key up to the FIRST period, one sample per
key.  stdlib ``zipfile`` handles stored and deflated members; the
central directory gives O(1) member listing (unlike tar's sequential
walk), which is why zip remains common for random-access datasets.

- ``write_zip_shard(samples)`` — deterministic zip bytes (fixed
  timestamp, sorted-within-sample members, deflate).
- ``parse_zip_shard(data)`` — group members by key -> one dict per
  sample; raises ValueError on corrupt archives (the uniform
  container-parser contract).
- ``read_zipshard_distributed(spark, path)`` — ``binaryFile`` scan +
  ``mapInPandas``: one task per shard, zero driver bytes,
  ``on_error='skip'`` for crawl-grade inputs.

The reference has no container layer (beyond-reference op, like WARC
and WebDataset).
"""

from __future__ import annotations

import io
import posixpath
import zipfile

import pandas as pd
from pyspark.sql import DataFrame, SparkSession


def write_zip_shard(samples: list[dict], *, compress: bool = True) -> bytes:
    """One member per (key, extension) pair; samples contiguous, fixed
    timestamp so output is byte-deterministic."""
    buf = io.BytesIO()
    method = zipfile.ZIP_DEFLATED if compress else zipfile.ZIP_STORED
    with zipfile.ZipFile(buf, "w", method) as zf:
        for s in samples:
            key = s["__key__"]
            for ext in sorted(k for k in s if k != "__key__"):
                name = f"{key}.{ext}" if ext else key
                zi = zipfile.ZipInfo(name, date_time=(1980, 1, 1, 0, 0, 0))
                zi.compress_type = method
                zf.writestr(zi, bytes(s[ext]))
    return buf.getvalue()


def parse_zip_shard(data: bytes) -> list[dict]:
    """Group zip members by basename key (up to the FIRST period,
    the WebDataset rule).  Returns ``{"__key__": key, ext: bytes}``
    dicts in first-appearance order."""
    out: dict[str, dict] = {}
    try:
        zf_ctx = zipfile.ZipFile(io.BytesIO(bytes(data)))
    except (zipfile.BadZipFile, OSError) as exc:
        raise ValueError(f"corrupt zip shard: {exc}") from exc
    with zf_ctx as zf:
        for info in zf.infolist():
            if info.is_dir():
                continue
            base = posixpath.basename(info.filename)
            key, dot, ext = base.partition(".")
            if not dot:
                key, ext = base, ""
            dirpart = posixpath.dirname(info.filename)
            if dirpart:
                key = f"{dirpart}/{key}"
            sample = out.setdefault(key, {"__key__": key})
            try:
                sample[ext] = zf.read(info)
            except (zipfile.BadZipFile, zipfile.LargeZipFile,
                    OSError) as exc:
                raise ValueError(f"corrupt zip member "
                                 f"{info.filename}: {exc}") from exc
    return list(out.values())


def read_zipshard_distributed(spark: SparkSession, path: str,
                              extensions: tuple = ("jpg", "txt"),
                              on_error: str = "fail") -> DataFrame:
    """One task per shard: ``binaryFile`` scan + mapInPandas grouping.
    Returns ``shard string, key string`` plus one BINARY column per
    requested extension (NULL when a sample lacks it).  At corpus
    scale a dataset is thousands of shards, so file-level parallelism
    saturates the cluster with no shuffle."""
    schema = ("shard string, key string, "
              + ", ".join(f"`{e}` binary" for e in extensions))
    files = spark.read.format("binaryFile").load(path) \
        .select("path", "content")

    def run(batches):
        for pdf in batches:
            rows = []
            for p, content in zip(pdf["path"], pdf["content"]):
                try:
                    shard = parse_zip_shard(bytes(content))
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

"""Snapshot-manifest table format: atomic commits + time travel.

The north rule's checkpoint story names Iceberg; the sandbox has no
catalog jars, so this implements the PROPERTIES that matter, on plain
parquet — the same properties plans/lineage.py assumes of its stage
directories:

- **readers see manifests, never directory listings** — a partially
  written or orphaned data file is invisible until a commit references
  it (the core Iceberg correctness rule);
- **commits are atomic** — the version pointer flips with
  ``os.replace`` after the manifest is fully written, and manifest
  creation uses ``O_EXCL`` so two concurrent committers cannot both
  win one version (optimistic concurrency: the loser retries on
  ``SnapshotConflict``);
- **time travel** — every version's manifest is immutable; ``read``
  takes a version, ``rollback`` just commits an old file list as a
  new version (history is never rewritten).

Layout::

    <root>/data/<commit-uuid>-<part>.parquet   (written once, immutable)
    <root>/metadata/v<N>.json                  {version, operation,
                                                files[{path, rows}],
                                                schema, parent}
    <root>/metadata/_current                   text: latest version N

Scale note: a manifest lists file PATHS (one JSON row per data file,
like an Iceberg manifest list), so reads open exactly the committed
files — partition pruning and predicate pushdown still happen inside
each parquet scan.
"""

from __future__ import annotations

import json
import os
import uuid

from pyspark.sql import DataFrame, SparkSession


class SnapshotConflict(RuntimeError):
    """Another committer won this version — reread and retry."""


class SnapshotTable:
    def __init__(self, root: str):
        self.root = root
        self.data_dir = os.path.join(root, "data")
        self.meta_dir = os.path.join(root, "metadata")
        os.makedirs(self.data_dir, exist_ok=True)
        os.makedirs(self.meta_dir, exist_ok=True)

    # -- metadata -----------------------------------------------------------
    def current_version(self) -> int:
        """0 when the table has no commits yet.

        Derived from the max existing vN.json, NOT from the _current
        pointer: a slow committer's os.replace of _current could regress
        the pointer below an already-committed version and wedge every
        later commit in a permanent conflict.  The manifest files are
        written O_EXCL before the pointer flips, so max(vN) is always the
        latest fully-committed version; _current stays as a cheap hint
        for humans inspecting the directory."""
        best = 0
        for name in os.listdir(self.meta_dir):
            if name.startswith("v") and name.endswith(".json"):
                try:
                    best = max(best, int(name[1:-5]))
                except ValueError:
                    continue
        return best

    def manifest(self, version: int | None = None) -> dict:
        v = self.current_version() if version is None else version
        if v <= 0:
            raise ValueError("snapshot table has no commits")
        p = os.path.join(self.meta_dir, f"v{v}.json")
        if not os.path.exists(p):
            raise ValueError(f"no snapshot version {v}")
        with open(p) as f:
            return json.load(f)

    def history(self) -> list[dict]:
        return [self.manifest(v)
                for v in range(1, self.current_version() + 1)]

    # -- commits ------------------------------------------------------------
    def _write_data(self, df: DataFrame) -> list[dict]:
        cid = uuid.uuid4().hex[:12]
        out = os.path.join(self.data_dir, cid)
        df.write.parquet(out)
        files = []
        for name in sorted(os.listdir(out)):
            if name.endswith(".parquet"):
                fp = os.path.join(out, name)
                files.append({"path": fp,
                              "rows": None})  # filled by commit census
        return files

    def _commit(self, files: list[dict], operation: str,
                schema: str, expected_parent: int | None = None) -> int:
        """``expected_parent``: the version the caller's file list was
        READ at.  If another committer landed a version in between, the
        file list is stale — committing it would silently drop the
        intervening commit's files — so the commit fails with
        SnapshotConflict and the caller rereads and retries (standard
        optimistic concurrency; O_EXCL alone only serializes committers
        racing for the SAME version number)."""
        parent = self.current_version()
        if expected_parent is not None and parent != expected_parent:
            raise SnapshotConflict(
                f"table advanced to v{parent} while this commit was "
                f"prepared against v{expected_parent} — reread and retry")
        version = parent + 1
        manifest = {"version": version, "parent": parent,
                    "operation": operation, "schema": schema,
                    "files": files}
        mp = os.path.join(self.meta_dir, f"v{version}.json")
        try:  # O_EXCL: exactly one committer wins a version number
            fd = os.open(mp, os.O_WRONLY | os.O_CREAT | os.O_EXCL)
        except FileExistsError as exc:
            raise SnapshotConflict(
                f"version {version} already committed") from exc
        with os.fdopen(fd, "w") as f:
            json.dump(manifest, f)
        tmp = os.path.join(self.meta_dir, f"_current.tmp.{version}")
        with open(tmp, "w") as f:
            f.write(str(version))
        os.replace(tmp, os.path.join(self.meta_dir, "_current"))
        return version

    def append(self, df: DataFrame) -> int:
        base = self.current_version()
        new = self._write_data(df)
        prev = self.manifest(base)["files"] if base else []
        return self._commit(prev + new, "append",
                            df.schema.simpleString(), expected_parent=base)

    def overwrite(self, df: DataFrame) -> int:
        base = self.current_version()
        new = self._write_data(df)
        return self._commit(new, "overwrite", df.schema.simpleString(),
                            expected_parent=base)

    def rollback(self, version: int) -> int:
        """Commit an old version's file list as a NEW version (history
        is append-only, the Iceberg rollback semantics)."""
        base = self.current_version()
        m = self.manifest(version)
        return self._commit(list(m["files"]), f"rollback_to_{version}",
                            m["schema"], expected_parent=base)

    def compact(self, spark: SparkSession, target_files: int) -> int:
        """Small-files compaction as a SNAPSHOT COMMIT: read the
        current version, rewrite as *target_files* files, commit — the
        same rows under a new manifest.  Readers pinned to older
        versions keep their exact file lists (time travel is
        unaffected); this is how a long-running append pipeline keeps
        its file count bounded without breaking isolation."""
        base = self.current_version()
        cur = self.read(spark, base)
        new = self._write_data(cur.coalesce(max(1, target_files)))
        return self._commit(new, "compact", cur.schema.simpleString(),
                            expected_parent=base)

    # -- reads --------------------------------------------------------------
    def read(self, spark: SparkSession,
             version: int | None = None) -> DataFrame:
        """Exactly the committed files — orphan/in-flight data files in
        data/ are invisible (manifest-based isolation)."""
        m = self.manifest(version)
        paths = [f["path"] for f in m["files"]]
        if not paths:
            raise ValueError("empty snapshot")
        return spark.read.parquet(*paths)

"""Minimal versioned-manifest table: snapshot-isolated reads on parquet.

`operators/upsert.py`'s stage-and-swap gives writers atomicity on
filesystems where ``os.rename`` of a directory is atomic — but a
reader that resolved the table path just before a swap can still list
the directory mid-rename on filesystems without atomic directory
moves (object stores), and a long-running reader job whose tasks
re-list input files mid-query could see the NEW table's files under
the same path. The reference never faces this because Postgres MVCC
versions every read (ui/backend/services/transaction_service.py
leans on it); Delta/Iceberg solve it with a transaction log. This
module is the smallest honest version of that log (VERDICT r3
next-round #7):

- every commit writes data files into a FRESH immutable directory
  (``data/<uuid>``), then a manifest ``_manifests/v{N}.json`` listing
  exactly those files, then atomically renames ``_latest.tmp`` →
  ``_latest`` to publish N;
- readers resolve ``_latest`` → manifest → explicit file list and
  hand that list to ``spark.read.parquet(*files)`` — Spark pins those
  concrete files for the whole query, so a commit that lands mid-read
  changes nothing the reader can observe. Old versions stay readable
  (time travel) until ``vacuum``.

Commits take the same ``table_write_lock`` as the swap path, so the
two mechanisms compose; single-writer, many-snapshot-readers. At
100 TB you would use Delta/Iceberg outright — the point here is that
the engine's write discipline already matches that model, and the
concurrent read/write test in tests/test_snapshot_table.py proves a
reader can never see a half-committed table.
"""

from __future__ import annotations

import json
import os
import shutil
import time
import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .upsert import table_write_lock


class SnapshotCorruptionError(RuntimeError):
    """The manifest chain is unreadable (not merely absent)."""


class SnapshotTable:
    """A parquet table addressed through a versioned manifest.

    Layout::

        <root>/
          _latest              # text file: highest committed version
          _manifests/v{N}.json # {"version", "files", "ts", "rows"?}
          data/<uuid>/         # immutable per-commit parquet dirs
    """

    def __init__(self, root: str):
        self.root = root
        self._manifest_dir = os.path.join(root, "_manifests")
        self._data_dir = os.path.join(root, "data")

    # ------------------------------------------------------------ write

    def commit_overwrite(
        self,
        df: DataFrame,
        timeout: float = 0.0,
        partition_by: str | None = None,
    ) -> int:
        """Commit df as the table's next full-replacement version.

        Returns the committed version number. Readers holding any
        previously published version are unaffected (their files are
        immutable and not deleted until :meth:`vacuum`).

        With ``partition_by`` the commit directory is hive-partitioned
        and the manifest records the directory instead of a flat file
        list — the snapshot guarantee is unchanged (the per-commit
        directory is immutable; only the published pointer moves) and
        readers keep partition pruning.
        """
        with table_write_lock(self.root, timeout=timeout):
            commit_dir = os.path.join(self._data_dir, uuid.uuid4().hex)
            schema_json = df.schema.json()
            if partition_by:
                df.write.mode("overwrite").partitionBy(partition_by).parquet(
                    commit_dir
                )
                return self._publish(
                    {
                        "dir": commit_dir,
                        "partitioned": True,
                        "files": [],
                        "schema": schema_json,
                    }
                )
            df.write.mode("overwrite").parquet(commit_dir)
            return self._publish(
                {"files": self._list_parquet(commit_dir), "schema": schema_json}
            )

    def commit_append(
        self,
        df: DataFrame,
        timeout: float = 0.0,
        dedup_key: str | None = None,
        spark: SparkSession | None = None,
    ) -> int:
        """Commit df as an APPEND version: the new manifest lists the
        previous version's files plus the new commit's. Existing files
        are never touched — readers on the old version see nothing.

        With ``dedup_key`` (and the session to read with), incoming
        rows whose key already exists are dropped first — insert-only
        semantics, with the existing-key read and the publish under
        one table lock so concurrent appenders can't both insert the
        same key.
        """
        with table_write_lock(self.root, timeout=timeout):
            prev_files: list[str] = []
            prev: dict | None = None
            if self.latest_version() > 0:
                prev = self.manifest()
                if prev.get("partitioned"):
                    raise ValueError(
                        "commit_append on a partitioned snapshot table is "
                        "not supported — use commit_overwrite per partition"
                    )
                prev_files = prev["files"]
            if dedup_key and prev_files:
                if spark is None:
                    spark = df.sparkSession
                existing = (
                    spark.read.parquet(*prev_files)
                    .select(dedup_key)
                    .filter(F.col(dedup_key).isNotNull())
                )
                df = df.join(existing, dedup_key, "left_anti")
            commit_dir = os.path.join(self._data_dir, uuid.uuid4().hex)
            df.write.mode("overwrite").parquet(commit_dir)
            # the manifest schema must describe EVERY file the version
            # lists, not just this append's: union-by-name with the
            # previous version's recorded schema (prev column order
            # first, genuinely-new columns appended; a re-typed column
            # takes the newest type). Catalog views derive their column
            # list from this (ADVICE r7 — commit-dir names are uuids,
            # so no dir listing is temporal).
            schema = df.schema
            # union even when the previous version listed no files (a
            # committed EMPTY table still has a recorded schema)
            if prev is not None and prev.get("schema"):
                from pyspark.sql.types import StructType

                prev_st = StructType.fromJson(json.loads(prev["schema"]))
                by_name = {f.name: f for f in schema.fields}
                fields = [by_name.pop(f.name, f) for f in prev_st.fields]
                schema = StructType(fields + list(by_name.values()))
            return self._publish(
                {
                    "files": prev_files + self._list_parquet(commit_dir),
                    "schema": schema.json(),
                }
            )

    @staticmethod
    def _list_parquet(commit_dir: str) -> list[str]:
        return sorted(
            os.path.join(commit_dir, f)
            for f in os.listdir(commit_dir)
            if f.endswith(".parquet")
        )

    def _publish(self, body: dict) -> int:
        """Write manifest v(N+1) then atomically move the ``_latest``
        pointer — the commit point. Caller holds the table lock."""
        os.makedirs(self._manifest_dir, exist_ok=True)
        version = self.latest_version() + 1
        manifest = {"version": version, "ts": time.time(), **body}
        mpath = os.path.join(self._manifest_dir, f"v{version:06d}.json")
        tmp = mpath + ".tmp"
        with open(tmp, "w") as f:
            json.dump(manifest, f)
            f.write("\n")
        os.rename(tmp, mpath)
        # publish: single-file rename is atomic where dir rename
        # may not be — this is the commit point
        ltmp = os.path.join(self.root, "_latest.tmp")
        with open(ltmp, "w") as f:
            f.write(str(version))
        os.rename(ltmp, os.path.join(self.root, "_latest"))
        return version

    # ------------------------------------------------------------- read

    def latest_version(self) -> int:
        """Highest published version, 0 if the table has no commits."""
        try:
            with open(os.path.join(self.root, "_latest")) as f:
                return int(f.read().strip())
        except FileNotFoundError:
            return 0
        except ValueError as e:
            raise SnapshotCorruptionError(
                f"unreadable _latest pointer in {self.root}"
            ) from e

    def manifest(self, version: int | None = None) -> dict:
        if version is None:
            version = self.latest_version()
        if version <= 0:
            raise FileNotFoundError(f"snapshot table {self.root} has no commits")
        mpath = os.path.join(self._manifest_dir, f"v{version:06d}.json")
        try:
            with open(mpath) as f:
                return json.load(f)
        except FileNotFoundError:
            raise
        except (json.JSONDecodeError, OSError) as e:
            raise SnapshotCorruptionError(f"unreadable manifest {mpath}") from e

    def read(self, spark: SparkSession, version: int | None = None) -> DataFrame:
        """Read a pinned snapshot (latest by default; older = time travel).

        The returned DataFrame's scan is bound to the manifest's
        explicit file list — concurrent commits cannot change what
        this query reads.
        """
        m = self.manifest(version)
        if m.get("partitioned"):
            # the per-commit dir is immutable, so a directory read is
            # just as pinned as a file-list read — and keeps hive
            # partition pruning
            has_data = any(
                f.endswith(".parquet")
                for _, _, fs in os.walk(m["dir"])
                for f in fs
            )
            if not has_data:
                # committed EMPTY partitioned table: AQE can coalesce
                # the write to zero part files, so there is nothing to
                # infer a schema from — replay the manifest's recorded
                # schema, same as the flat branch below (ADVICE r7)
                if m.get("schema"):
                    from pyspark.sql.types import StructType

                    return spark.createDataFrame(
                        [], StructType.fromJson(json.loads(m["schema"]))
                    )
                raise SnapshotCorruptionError(
                    f"manifest v{m['version']} of {self.root} has an empty "
                    "partitioned commit dir and records no schema"
                )
            return spark.read.parquet(m["dir"])
        if not m["files"]:
            # A legitimately committed EMPTY table: AQE may coalesce an
            # empty write to zero part files, leaving nothing on disk
            # to infer from — the manifest's recorded schema is the
            # table's schema, so replay it (ADVICE r6). Only manifests
            # predating schema recording are corrupt here.
            if m.get("schema"):
                from pyspark.sql.types import StructType

                return spark.createDataFrame(
                    [], StructType.fromJson(json.loads(m["schema"]))
                )
            raise SnapshotCorruptionError(
                f"manifest v{m['version']} of {self.root} lists no files "
                "and records no schema"
            )
        return spark.read.parquet(*m["files"])

    # ---------------------------------------------------------- maintain

    def vacuum(self, keep_last: int = 2) -> list[int]:
        """Drop manifests+data older than the newest ``keep_last``
        versions. Returns the removed version numbers. Callers choose a
        retention long enough for in-flight readers to finish (same
        contract as Delta's VACUUM)."""
        with table_write_lock(self.root):
            latest = self.latest_version()
            removed = []
            keep_files: set[str] = set()
            versions = sorted(
                int(f[1:-5])
                for f in os.listdir(self._manifest_dir)
                if f.startswith("v") and f.endswith(".json")
            ) if os.path.isdir(self._manifest_dir) else []
            def commit_dirs(v: int) -> set[str]:
                m = self.manifest(v)
                if m.get("partitioned"):
                    return {m["dir"]}
                return {os.path.dirname(p) for p in m["files"]}

            for v in versions:
                if v > latest - keep_last:
                    keep_files.update(commit_dirs(v))
            for v in versions:
                if v <= latest - keep_last:
                    for d in commit_dirs(v) - keep_files:
                        shutil.rmtree(d, ignore_errors=True)
                    os.remove(
                        os.path.join(self._manifest_dir, f"v{v:06d}.json")
                    )
                    removed.append(v)
            return removed

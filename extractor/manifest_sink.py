"""Two-phase-commit manifest sink — the S5 output sink with Iceberg-style
atomic visibility, built on the Python Data Source writer API:

    from extractor.manifest_sink import ManifestParquetDataSource
    spark.dataSource.register(ManifestParquetDataSource)
    df.write.format("manifest_parquet").option("path", out).mode("append").save()

Commit protocol (what an Iceberg snapshot commit does, on plain files):

1. every task writes its rows to ``<path>/data/part-<uuid>.parquet`` and
   returns a :class:`WriterCommitMessage` carrying (file, rows, bytes);
2. the DRIVER, only after every task succeeded, appends those files to
   ``<path>/_manifest.json`` via write-temp + ``os.rename`` — the single
   atomic step; a crash before it leaves data files orphaned but the
   table state unchanged;
3. ``abort`` deletes the staged files of the failed attempt.

Readers go through :func:`read_manifest`, which loads EXACTLY the
manifest-listed files — uncommitted/orphaned part files are invisible, so
a torn job can never surface partial output (the property the engine's
bucket checkpoint assumes of its sink).

Scale: commit cost is O(files) driver-side JSON, data never moves twice;
the manifest doubles as file-level lineage (rows/bytes per part).

Lifecycle verbs on top of the same manifest: snapshot ids + 
``read_manifest(as_of=)`` time travel, write-audit-publish branches
(``.option("branch", "audit")`` stages invisibly; :func:`publish_branch`
promotes atomically, :func:`drop_branch` rejects), and orphan-file GC.
"""

from __future__ import annotations

import json
import os
import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.datasource import (
    DataSource,
    DataSourceWriter,
    WriterCommitMessage,
)


class _FileCommit(WriterCommitMessage):
    def __init__(self, file: str, rows: int, n_bytes: int):
        self.file = file
        self.rows = rows
        self.n_bytes = n_bytes


class ManifestParquetWriter(DataSourceWriter):
    def __init__(self, options, schema, overwrite: bool):
        self.path = options.get("path")
        if not self.path:
            raise ValueError("manifest_parquet requires .option('path', ...)")
        self.schema = schema
        self.overwrite = overwrite
        # write-audit-publish: a non-main branch stages its snapshot
        # invisibly; publish_branch() promotes it atomically
        self.branch = options.get("branch", "main")

    def write(self, iterator) -> WriterCommitMessage:
        import pyarrow as pa
        import pyarrow.parquet as pq
        from pyspark.sql.pandas.types import to_arrow_schema

        rows = [r.asDict() for r in iterator]
        os.makedirs(f"{self.path}/data", exist_ok=True)
        fname = f"data/part-{uuid.uuid4().hex}.parquet"
        full = f"{self.path}/{fname}"
        names = [f.name for f in self.schema.fields]
        # explicit arrow schema from the Spark schema: an empty partition or
        # an all-None column must still write correctly-typed columns, or
        # read_manifest's multi-file read fails on null-type schema merge
        arrow_schema = to_arrow_schema(self.schema)
        table = pa.Table.from_pydict(
            {n: [r.get(n) for r in rows] for n in names}, schema=arrow_schema
        )
        pq.write_table(table, full)
        return _FileCommit(fname, len(rows), os.path.getsize(full))

    def commit(self, messages) -> None:
        # overwrite resets THIS branch's history; other branches keep
        # their staged snapshots (branch isolation)
        entries = (
            [
                e
                for e in _load_manifest(self.path)
                if e.get("branch", "main") != self.branch
            ]
            if self.overwrite
            else _load_manifest(self.path)
        )
        # each successful job is one snapshot (Iceberg semantics): tag
        # its files with the next id so readers can time-travel; branch
        # snapshots number within their branch and stay invisible to
        # main readers until published
        snap = 1 + max(
            (
                e.get("snapshot", 0)
                for e in entries
                if e.get("branch", "main") == self.branch
            ),
            default=0,
        )
        for m in messages:
            if m is not None:
                entries.append(
                    {
                        "file": m.file,
                        "rows": m.rows,
                        "bytes": m.n_bytes,
                        "snapshot": snap,
                        "branch": self.branch,
                    }
                )
        _rewrite_manifest(self.path, entries)  # atomic visibility step

    def abort(self, messages) -> None:
        for m in messages:
            if m is not None:
                try:
                    os.remove(f"{self.path}/{m.file}")
                except FileNotFoundError:
                    pass


class ManifestParquetDataSource(DataSource):
    @classmethod
    def name(cls) -> str:
        return "manifest_parquet"

    def writer(self, schema, overwrite: bool) -> ManifestParquetWriter:
        return ManifestParquetWriter(self.options, schema, overwrite)


def _load_manifest(path: str) -> list[dict]:
    try:
        with open(f"{path}/_manifest.json") as f:
            return json.load(f)["files"]
    except FileNotFoundError:
        return []


def read_manifest(spark: SparkSession, path: str,
                  as_of: int | None = None,
                  branch: str = "main") -> DataFrame:
    """Read exactly the committed files (orphans invisible).

    ``as_of`` time-travels to a snapshot id (see :func:`snapshots`):
    only files committed by snapshots ``<= as_of`` are read — the
    Iceberg ``VERSION AS OF`` analogue, free because append-only
    snapshots never rewrite earlier files.  Entries written before
    snapshot tagging existed count as snapshot 0 (always visible).
    ``branch`` selects a write-audit-publish staging branch; the
    default reads only published (main) data."""
    entries = [
        e
        for e in _load_manifest(path)
        if e.get("branch", "main") == branch
    ]
    if as_of is not None:
        entries = [e for e in entries if e.get("snapshot", 0) <= as_of]
    files = [f"{path}/{e['file']}" for e in entries]
    if not files:
        raise FileNotFoundError(
            f"no committed files under {path} (branch {branch})"
            + (f" as of snapshot {as_of}" if as_of is not None else "")
        )
    return spark.read.parquet(*files)


def snapshots(path: str, branch: str = "main") -> list[dict]:
    """Snapshot history of a manifest table branch: one row per
    snapshot id with its file count and cumulative row count — the
    ``table.history()`` analogue, read straight from the manifest (no
    data files touched)."""
    per: dict[int, dict] = {}
    for e in _load_manifest(path):
        if e.get("branch", "main") != branch:
            continue
        s = per.setdefault(
            e.get("snapshot", 0), {"n_files": 0, "n_rows": 0}
        )
        s["n_files"] += 1
        s["n_rows"] += e["rows"]
    return [
        {"snapshot": k, **v} for k, v in sorted(per.items())
    ]


def _rewrite_manifest(path: str, entries: list[dict]) -> None:
    manifest = f"{path}/_manifest.json"
    tmp = f"{manifest}.tmp-{uuid.uuid4().hex}"
    with open(tmp, "w") as f:
        json.dump({"files": entries}, f)
    os.rename(tmp, manifest)  # atomic


def publish_branch(path: str, branch: str) -> dict:
    """Write-audit-publish PROMOTE: atomically move every snapshot of
    *branch* onto main as one new main snapshot.  The data files do not
    move — publication is a single manifest rewrite (rename-atomic), so
    a reader sees either none or all of the branch, never part of it;
    this is Iceberg's WAP ``cherry-pick`` on plain files.  Returns
    ``{published_files, published_rows, main_snapshot}``."""
    entries = _load_manifest(path)
    staged = [e for e in entries if e.get("branch", "main") == branch]
    if branch == "main" or not staged:
        raise ValueError(f"nothing staged on branch {branch!r}")
    snap = 1 + max(
        (
            e.get("snapshot", 0)
            for e in entries
            if e.get("branch", "main") == "main"
        ),
        default=0,
    )
    for e in staged:
        e["branch"] = "main"
        e["snapshot"] = snap
    _rewrite_manifest(path, entries)
    return {
        "published_files": len(staged),
        "published_rows": sum(e["rows"] for e in staged),
        "main_snapshot": snap,
    }


def drop_branch(path: str, branch: str) -> dict:
    """Write-audit-publish REJECT: atomically remove *branch*'s entries
    from the manifest.  Its data files become orphans (invisible to all
    readers immediately) and are reclaimed by
    :func:`remove_orphan_files` — deletion is deferred exactly so a
    concurrent reader holding the old manifest never loses a file mid-
    read.  Returns ``{dropped_files, dropped_rows}``."""
    if branch == "main":
        raise ValueError("refusing to drop main")
    entries = _load_manifest(path)
    dropped = [e for e in entries if e.get("branch", "main") == branch]
    kept = [e for e in entries if e.get("branch", "main") != branch]
    _rewrite_manifest(path, kept)
    return {
        "dropped_files": len(dropped),
        "dropped_rows": sum(e["rows"] for e in dropped),
    }


def find_orphan_files(path: str) -> list[str]:
    """Files under ``{path}/data`` that NO committed manifest entry
    references — the leftovers of aborted/crashed write jobs (a task
    stages its part file before the driver's atomic manifest append; a
    failure between the two strands the file).  Readers never see them
    (``read_manifest`` reads only committed entries), but they cost
    storage and file-listing time forever unless collected.  Returns
    repo-relative names sorted for determinism."""
    committed = {e["file"] for e in _load_manifest(path)}
    data_dir = os.path.join(path, "data")
    if not os.path.isdir(data_dir):
        return []
    found = [
        f"data/{f}"
        for f in os.listdir(data_dir)
        if f.endswith(".parquet")
    ]
    return sorted(f for f in found if f not in committed)


def remove_orphan_files(path: str, dry_run: bool = True) -> dict:
    """Iceberg ``remove_orphan_files`` analogue for the manifest sink:
    delete (or, with ``dry_run=True``, just report) staged part files
    that no manifest entry references.  NEVER touches committed files or
    the manifest itself, so a concurrent ``read_manifest`` is unaffected
    — the same safety contract as the catalog procedure.  On a real
    object store add an age floor (e.g. orphaned > 3 days) so files
    staged by in-flight writers are not collected; in this single-writer
    model the manifest append is atomic with task completion, so any
    unreferenced file is already dead."""
    orphans = find_orphan_files(path)
    removed = []
    if not dry_run:
        for f in orphans:
            try:
                os.remove(os.path.join(path, f))
                removed.append(f)
            except FileNotFoundError:
                pass
    return {
        "orphans_found": len(orphans),
        "orphans_removed": len(removed) if not dry_run else 0,
        "dry_run": dry_run,
        "files": orphans,
    }

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
        manifest = f"{self.path}/_manifest.json"
        entries = [] if self.overwrite else _load_manifest(self.path)
        # each successful job is one snapshot (Iceberg semantics): tag
        # its files with the next id so readers can time-travel
        snap = 1 + max((e.get("snapshot", 0) for e in entries), default=0)
        for m in messages:
            if m is not None:
                entries.append(
                    {
                        "file": m.file,
                        "rows": m.rows,
                        "bytes": m.n_bytes,
                        "snapshot": snap,
                    }
                )
        tmp = f"{manifest}.tmp-{uuid.uuid4().hex}"
        with open(tmp, "w") as f:
            json.dump({"files": entries}, f)
        os.rename(tmp, manifest)  # the atomic visibility step

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
                  as_of: int | None = None) -> DataFrame:
    """Read exactly the committed files (orphans invisible).

    ``as_of`` time-travels to a snapshot id (see :func:`snapshots`):
    only files committed by snapshots ``<= as_of`` are read — the
    Iceberg ``VERSION AS OF`` analogue, free because append-only
    snapshots never rewrite earlier files.  Entries written before
    snapshot tagging existed count as snapshot 0 (always visible)."""
    entries = _load_manifest(path)
    if as_of is not None:
        entries = [e for e in entries if e.get("snapshot", 0) <= as_of]
    files = [f"{path}/{e['file']}" for e in entries]
    if not files:
        raise FileNotFoundError(
            f"no committed files under {path}"
            + (f" as of snapshot {as_of}" if as_of is not None else "")
        )
    return spark.read.parquet(*files)


def snapshots(path: str) -> list[dict]:
    """Snapshot history of a manifest table: one row per snapshot id
    with its file count and cumulative row count — the
    ``table.history()`` analogue, read straight from the manifest (no
    data files touched)."""
    per: dict[int, dict] = {}
    for e in _load_manifest(path):
        s = per.setdefault(
            e.get("snapshot", 0), {"n_files": 0, "n_rows": 0}
        )
        s["n_files"] += 1
        s["n_rows"] += e["rows"]
    return [
        {"snapshot": k, **v} for k, v in sorted(per.items())
    ]


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

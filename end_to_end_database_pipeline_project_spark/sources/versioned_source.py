"""`versioned_table` Spark format: batch + streaming SOURCE over the
versioned table (sources/versioned.py), as a Spark 4 Python DataSource.

``incremental_scan``/``read_version`` are library calls; this wraps the
same manifest protocol as a *format*, so ANY Spark pipeline can say

    spark.read.format("versioned_table").option("path", p)...
    spark.readStream.format("versioned_table").option("path", p)...

- **Batch read**: the pinned (or latest) version, chain-resolved in
  EXECUTORS — one input partition per committed data file, tombstones
  applied as a per-partition key filter (forget-lists are small and
  bounded, shipped with the partition like a broadcast; the same
  assumption `gdpr_erasure_report` broadcasts on).
- **Streaming read**: offset = committed version number (the Delta
  streaming-source contract). Each micro-batch is the append commits
  in (start, end]; the checkpoint holds the version cursor, so a
  restart resumes exactly where it stopped and every committed batch
  is read once. A mid-history FULL snapshot (compaction/rewrite)
  breaks append lineage and fails loudly — resync from it; tombstone
  commits fail too unless ``ignoredeletes`` is set (Delta's
  ignoreDeletes), because silently skipping deletes would diverge the
  downstream copy.

Options: ``path`` (table root), ``schema`` (DDL, must name the table's
written columns), ``version`` (batch: pin a snapshot), ``ignoredeletes``
(stream: skip tombstone commits), ``ignorechanges`` (stream: emit
upsert commits' rows as plain appends — Delta's ignoreChanges).

Scale note: partitions map 1:1 to committed parquet files, so the read
parallelizes like any file scan; rows cross Python here (Arrow batch
reads), which is the honest cost of the pure-Python DataSource API —
for JVM-speed scans of heavy tables use the library calls
(``read_version``/``incremental_scan`` compile to native parquet
scans); this format exists so the table plugs into generic
readStream/read pipelines. Cited reference behavior: the polling
re-sync loop (scheduler.py:45-73) and the precomputed-gold reads
(clickhouse_etl.py:301-456) — here both sides go through one committed
manifest.
"""

from __future__ import annotations

import os
from collections.abc import Iterator

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    DataSourceStreamReader,
    InputPartition,
)

from .versioned import _chain, _entry, _mode, versions


def _schema_cols(ddl: str) -> list[str]:
    return [f.strip().split()[0] for f in ddl.split(",") if f.strip()]


def _data_files(path: str, entry: dict) -> list[str]:
    d = os.path.join(path, entry["dir"])
    return sorted(
        os.path.join(d, f)
        for f in os.listdir(d)
        if f.startswith("part-") and f.endswith(".parquet")
    )


def _tombstone_keys(path: str, entry: dict) -> frozenset:
    """Driver-side load of one tombstone commit's keys (forget-lists
    are small and bounded — the same size assumption every anti-join
    in the repo broadcasts on)."""
    import pyarrow.parquet as pq

    keys: set = set()
    for f in _data_files(path, entry):
        keys.update(pq.read_table(f, columns=[entry["key"]])[0].to_pylist())
    return frozenset(keys)


def _read_file(
    file_path: str,
    cols: list[str],
    exclusions: tuple,  # ((key_col, frozenset(keys)), ...)
) -> Iterator[tuple]:
    import pyarrow as pa
    import pyarrow.parquet as pq

    # schema evolution: a file written before a column was added just
    # lacks it — read what exists, null-fill the rest
    present = set(pq.read_schema(file_path).names)
    tbl = pq.read_table(file_path, columns=[c for c in cols if c in present])
    columns = []
    for c in cols:
        if c not in present:
            columns.append([None] * tbl.num_rows)
            continue
        a = tbl[c]
        t = a.type
        if pa.types.is_timestamp(t) and t.tz is None:
            # parquet INT96/naive timestamps hold UTC instants (the
            # engine pins the session TZ to UTC — see catalog.load_table);
            # the DataSource serializer needs them tz-aware
            a = a.cast(pa.timestamp(t.unit, tz="UTC"))
        columns.append(a.to_pylist())
    live = [(cols.index(kc), keys) for kc, keys in exclusions if keys]
    if live:
        for row in zip(*columns):
            if not any(row[ki] in keys for ki, keys in live):
                yield row
    else:
        yield from zip(*columns)


class _VersionedBatchReader(DataSourceReader):
    def __init__(self, options: dict):
        self.path = options["path"]
        self.cols = _schema_cols(options["schema"])
        self.version = int(options["version"]) if "version" in options else None

    def partitions(self):
        vs = versions(self.path)
        entry = _entry(vs, self.path, self.version)
        chain = _chain(vs, entry, self.path)
        parts = []
        # delete AND replace entries both tombstone their keys in
        # earlier commits (a replace additionally contributes its own
        # rows as data)
        tomb_cache = {
            e["version"]: (e["key"], _tombstone_keys(self.path, e))
            for e in chain
            if _mode(e) in ("delete", "replace")
        }
        for i, e in enumerate(chain):
            if _mode(e) == "delete":
                continue
            # tombstones/upserts committed AFTER this data entry hide
            # its matched rows; exclusions stay grouped per key column
            # (tombstones on different keys must not be merged)
            per_key: dict = {}
            for t in chain[i + 1 :]:
                if _mode(t) in ("delete", "replace"):
                    kc, keys = tomb_cache[t["version"]]
                    per_key[kc] = per_key.get(kc, frozenset()) | keys
            exclusions = tuple(per_key.items())
            for f in _data_files(self.path, e):
                parts.append(InputPartition((f, exclusions)))
        return parts

    def read(self, partition) -> Iterator[tuple]:
        f, exclusions = partition.value
        yield from _read_file(f, self.cols, exclusions)


class _VersionedStreamReader(DataSourceStreamReader):
    def __init__(self, options: dict):
        self.path = options["path"]
        self.cols = _schema_cols(options["schema"])
        self.ignore_deletes = (
            options.get("ignoredeletes", "false").lower() == "true"
        )
        self.ignore_changes = (
            options.get("ignorechanges", "false").lower() == "true"
        )

    def initialOffset(self) -> dict:
        return {"version": 0}

    def latestOffset(self) -> dict:
        vs = versions(self.path)
        return {"version": vs[-1]["version"] if vs else 0}

    def partitions(self, start: dict, end: dict):
        vs = versions(self.path)
        lo, hi = start["version"], end["version"]
        first_version = vs[0]["version"] if vs else None
        parts = []
        for e in vs:
            if not (lo < e["version"] <= hi):
                continue
            m = _mode(e)
            if m == "full" and e["version"] != first_version:
                # a mid-history rewrite/compaction: append lineage is
                # broken; replaying it would duplicate history
                raise ValueError(
                    f"versioned_table stream at {self.path}: version "
                    f"{e['version']} is a full-snapshot rewrite — "
                    "resync the consumer from it"
                )
            if m == "delete":
                if self.ignore_deletes:
                    continue
                raise ValueError(
                    f"versioned_table stream at {self.path}: version "
                    f"{e['version']} is a tombstone commit; set "
                    "ignoredeletes=true to skip deletes (downstream "
                    "copy will retain deleted rows) or consume the CDF "
                    "via incremental_scan"
                )
            if m == "replace" and not self.ignore_changes:
                raise ValueError(
                    f"versioned_table stream at {self.path}: version "
                    f"{e['version']} is an upsert commit; set "
                    "ignorechanges=true to stream its rows as plain "
                    "appends (downstream copy may duplicate replaced "
                    "keys) or consume the CDF via incremental_scan"
                )
            for f in _data_files(self.path, e):
                parts.append(InputPartition((f,)))
        # Spark requires at least one partition per micro-batch plan;
        # an empty range yields one no-op partition
        return parts or [InputPartition((None,))]

    def read(self, partition) -> Iterator[tuple]:
        (f,) = partition.value
        if f is None:
            return
        yield from _read_file(f, self.cols, ())

    def commit(self, end: dict) -> None:
        pass  # the checkpoint holds the cursor; nothing to reclaim


class VersionedTableDataSource(DataSource):
    @classmethod
    def name(cls) -> str:
        return "versioned_table"

    def schema(self) -> str:
        return self.options["schema"]

    def reader(self, schema) -> DataSourceReader:
        return _VersionedBatchReader(self.options)

    def streamReader(self, schema) -> DataSourceStreamReader:
        return _VersionedStreamReader(self.options)


def register(spark) -> None:
    spark.dataSource.register(VersionedTableDataSource)

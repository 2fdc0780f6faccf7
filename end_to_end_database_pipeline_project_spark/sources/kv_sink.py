"""Key-value cache sink as a Spark Python DataSource writer (Spark 4).

The reference serves dashboards from a Redis cache refreshed by the
pipeline (redis_cache.py: key -> JSON envelope with a TTL). Round 2
modeled the *computation* (TTL-as-data envelopes); this module adds the
*connector*: a custom sink with the exactly-once commit protocol every
real cache/KV writer needs.

Protocol (the standard two-phase task-commit shape):

- each executor task writes its rows to an UNCOMMITTED temp file named
  by (partitionId, taskAttemptId) — retried/speculative attempts never
  collide;
- the driver's ``commit()`` publishes: renames every acked temp file to
  its final name and writes a ``_MANIFEST.json`` listing exactly the
  committed files (+ row counts). Readers resolve the manifest first,
  so half-written or orphaned attempt files are invisible;
- ``abort()`` deletes temp files — a failed job leaves the previous
  manifest (and therefore the previous cache generation) intact: the
  truncate-and-load cache refresh is atomic at manifest granularity,
  the same latest-generation-wins semantics as the reference's cache
  swap (redis_cache.py set-with-ttl refresh).

The streaming variant commits per micro-batch with the batch id in the
manifest; re-committing the same batch id after a restart overwrites
the same manifest — idempotent, which is what makes it exactly-once
under checkpoint replay.

Rows are stored as one JSON object per line: ``key`` (stringified key
column), ``expires_at`` (injectable clock + TTL — wall-clock is an
option, never read inside the engine, per SURVEY §5.3), and the
remaining columns flattened. Locally the "store" is a directory;
at scale the same protocol targets an object store prefix.
"""

from __future__ import annotations

import json
import os
import uuid
from dataclasses import dataclass
from typing import Iterator

from pyspark.sql.datasource import (
    DataSource,
    DataSourceStreamWriter,
    DataSourceWriter,
    WriterCommitMessage,
)


@dataclass
class _KvCommit(WriterCommitMessage):
    tmp_path: str
    final_path: str
    rows: int


class _KvWriterBase:
    def __init__(self, options: dict, schema_names: list[str]):
        self.path = options["path"]
        self.key_col = options.get("key", schema_names[0])
        self.ttl_seconds = int(options.get("ttl_seconds", 0)) or None
        self.now_epoch = int(options.get("now_epoch", 0)) or None
        self.names = schema_names

    def write(self, iterator: Iterator) -> _KvCommit:
        from pyspark import TaskContext

        ctx = TaskContext.get()
        pid = ctx.partitionId() if ctx else 0
        attempt = ctx.taskAttemptId() if ctx else uuid.uuid4().int % 10**9
        os.makedirs(self.path, exist_ok=True)
        tmp = os.path.join(self.path, f".part-{pid:05d}-{attempt}.jsonl.tmp")
        final = os.path.join(self.path, f"part-{pid:05d}.jsonl")
        expires = (
            self.now_epoch + self.ttl_seconds
            if self.now_epoch and self.ttl_seconds
            else None
        )
        n = 0
        with open(tmp, "w", encoding="utf-8") as f:
            for row in iterator:
                d = row.asDict()
                rec = {"key": str(d.pop(self.key_col)), "expires_at": expires, **d}
                f.write(json.dumps(rec, sort_keys=True, default=str) + "\n")
                n += 1
        return _KvCommit(tmp_path=tmp, final_path=final, rows=n)

    def _publish(self, messages, manifest_name: str, extra: dict) -> None:
        files, total = [], 0
        for m in messages:
            if m is None:
                continue
            os.replace(m.tmp_path, m.final_path)
            files.append({"file": os.path.basename(m.final_path), "rows": m.rows})
            total += m.rows
        manifest = {"files": files, "total_rows": total, **extra}
        tmp_manifest = os.path.join(self.path, f".{manifest_name}.tmp")
        with open(tmp_manifest, "w", encoding="utf-8") as f:
            json.dump(manifest, f, sort_keys=True)
        os.replace(tmp_manifest, os.path.join(self.path, manifest_name))

    def abort(self, messages) -> None:
        for m in messages or []:
            if m is not None and os.path.exists(m.tmp_path):
                os.remove(m.tmp_path)


class _KvBatchWriter(_KvWriterBase, DataSourceWriter):
    def commit(self, messages) -> None:
        self._publish(messages, "_MANIFEST.json", {})


class _KvStreamWriter(_KvWriterBase, DataSourceStreamWriter):
    def commit(self, messages, batchId: int) -> None:  # noqa: N803 (API name)
        self._publish(messages, "_MANIFEST.json", {"batch_id": batchId})

    def abort(self, messages, batchId: int) -> None:  # noqa: N803
        _KvWriterBase.abort(self, messages)


class KvCacheSinkDataSource(DataSource):
    @classmethod
    def name(cls) -> str:
        return "kv_cache"

    def writer(self, schema, overwrite: bool) -> DataSourceWriter:
        return _KvBatchWriter(self.options, schema.fieldNames())

    def streamWriter(self, schema, overwrite: bool) -> DataSourceStreamWriter:
        return _KvStreamWriter(self.options, schema.fieldNames())


def register(spark) -> None:
    spark.dataSource.register(KvCacheSinkDataSource)


def committed_files(path: str) -> list[str]:
    """Resolve the store through its manifest — the only committed view."""
    with open(os.path.join(path, "_MANIFEST.json"), encoding="utf-8") as f:
        manifest = json.load(f)
    return [os.path.join(path, e["file"]) for e in manifest["files"]]

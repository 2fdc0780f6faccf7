"""Versioned parquet tables: snapshot isolation + time travel on a
plain object-store layout.

The lakehouse-table property the reference's truncate-and-load warehouse
refresh (clickhouse_etl.py TRUNCATE + INSERT) lacks: readers racing a
refresh see half-loaded tables. The fix every modern table format
(Delta/Iceberg-style) applies is indirection through a committed
manifest: each write lands a COMPLETE new snapshot under ``v=N/`` and
only then atomically publishes ``_VERSIONS.json``; readers resolve the
manifest first, so they always see exactly one fully-committed
snapshot, and every historical snapshot stays addressable (time
travel / audit / reproducible training runs pinned to a data version).

Kept deliberately minimal — full snapshots, no delta logs or
compaction, version number == generation — because the point is the
commit/read protocol, not a format reimplementation. The data-version
pinning is the same contract the serving envelope's ``data_version``
exposes downstream (redis_cache.py envelope field).
"""

from __future__ import annotations

import json
import os

from pyspark.sql import DataFrame, SparkSession


def _manifest_path(path: str) -> str:
    return os.path.join(path, "_VERSIONS.json")


def versions(path: str) -> list[dict]:
    """Committed snapshots, oldest first. Uncommitted ``v=N`` dirs
    (crashed writers) are invisible — they're not in the manifest."""
    mp = _manifest_path(path)
    if not os.path.exists(mp):
        return []
    with open(mp, encoding="utf-8") as f:
        return json.load(f)["versions"]


def write_version(df: DataFrame, path: str) -> int:
    """Publish ``df`` as the next snapshot. The data write completes
    BEFORE the manifest swap, so a failure at any point leaves the
    previous version current and readable."""
    vs = versions(path)
    n = (vs[-1]["version"] + 1) if vs else 1
    vdir = os.path.join(path, f"v={n}")
    df.write.mode("overwrite").parquet(vdir)
    rows = df.sparkSession.read.parquet(vdir).count()
    vs = vs + [{"version": n, "dir": f"v={n}", "rows": rows}]
    tmp = _manifest_path(path) + ".tmp"
    with open(tmp, "w", encoding="utf-8") as f:
        json.dump({"versions": vs}, f, sort_keys=True)
    os.replace(tmp, _manifest_path(path))
    return n


def read_version(
    spark: SparkSession, path: str, version: int | None = None
) -> DataFrame:
    """Time-travel read: the given committed version, or the latest."""
    vs = versions(path)
    if not vs:
        raise FileNotFoundError(f"no committed versions at {path}")
    if version is None:
        entry = vs[-1]
    else:
        match = [v for v in vs if v["version"] == version]
        if not match:
            raise ValueError(f"version {version} not committed at {path}")
        entry = match[0]
    return spark.read.parquet(os.path.join(path, entry["dir"]))


def expire_versions(path: str, retain_last: int = 2) -> list[int]:
    """Vacuum: expire all but the newest ``retain_last`` snapshots.

    Crash-safe in the same direction as the writer: the manifest swap
    happens FIRST (expired versions become unaddressable atomically),
    data directories are deleted after. Only directories numbered
    BELOW the oldest retained version are reclaimed — an in-flight
    ``write_version`` always writes a HIGHER number than any committed
    entry, so a concurrent vacuum can never delete a snapshot that is
    about to be published (old crash orphans below the watermark are
    still reclaimed). Returns the expired version numbers."""
    import shutil

    if retain_last < 1:
        raise ValueError(
            f"retain_last must be >= 1 (got {retain_last}): a table must "
            "keep at least its current snapshot"
        )
    vs = versions(path)
    if len(vs) <= retain_last:
        return []
    drop, keep = vs[:-retain_last], vs[-retain_last:]
    tmp = _manifest_path(path) + ".tmp"
    with open(tmp, "w", encoding="utf-8") as f:
        json.dump({"versions": keep}, f, sort_keys=True)
    os.replace(tmp, _manifest_path(path))
    # reclaim every dir strictly below the retention watermark that the
    # manifest no longer references (dropped entries + crash orphans);
    # dirs at/above the watermark may belong to an in-flight writer
    min_keep = keep[0]["version"]
    live = {v["dir"] for v in keep}
    for d in os.listdir(path):
        if not (d.startswith("v=") and d not in live):
            continue
        try:
            n = int(d.split("=", 1)[1])
        except ValueError:
            continue
        if n < min_keep:
            shutil.rmtree(os.path.join(path, d), ignore_errors=True)
    return [v["version"] for v in drop]

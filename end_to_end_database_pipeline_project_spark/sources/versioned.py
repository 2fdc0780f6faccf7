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

Two commit modes:

- ``write_version`` publishes a FULL snapshot (mode ``full``) — the
  original truncate-and-load replacement;
- ``append_version`` publishes only the DELTA rows (mode ``append``):
  the logical content of an append version is its chain — the nearest
  preceding full snapshot plus every append since. ``read_version``
  resolves the chain transparently, and ``incremental_scan`` reads
  ONLY the delta directories between two committed versions. That is
  the change-data-feed contract a downstream sync needs at 100 TB:
  catching a consumer up from version A to B costs O(rows appended
  between A and B) — the appended files and nothing else — never a
  snapshot re-scan (Iceberg's incremental append scan semantics).

Kept deliberately minimal otherwise — no delete vectors or row-level
merges (updates go through a new full snapshot, which also resets the
chain), version number == generation — because the point is the
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


def _mode(entry: dict) -> str:
    # entries written before append support carry no mode key: full
    return entry.get("mode", "full")


def _commit(df: DataFrame, path: str, mode: str) -> int:
    """Shared commit protocol: land the COMPLETE data directory, then
    atomically publish the manifest. A failure at any point leaves the
    previous manifest current and readable."""
    vs = versions(path)
    n = (vs[-1]["version"] + 1) if vs else 1
    vdir = os.path.join(path, f"v={n}")
    df.write.mode("overwrite").parquet(vdir)
    rows = df.sparkSession.read.parquet(vdir).count()
    vs = vs + [{"version": n, "dir": f"v={n}", "rows": rows, "mode": mode}]
    tmp = _manifest_path(path) + ".tmp"
    with open(tmp, "w", encoding="utf-8") as f:
        json.dump({"versions": vs}, f, sort_keys=True)
    os.replace(tmp, _manifest_path(path))
    return n


def write_version(df: DataFrame, path: str) -> int:
    """Publish ``df`` as the next FULL snapshot. Starts a new append
    chain: versions before it never need re-reading to resolve any
    version at or after it."""
    return _commit(df, path, "full")


def append_version(df: DataFrame, path: str) -> int:
    """Publish ``df`` as an APPEND delta on the current chain: the new
    version's logical content is the previous version's rows plus
    ``df``. Only the delta rows are written — the 100 TB point: a
    committed append costs O(delta) storage and lets ``incremental_scan``
    sync a consumer in O(delta) reads. The manifest entry's ``rows``
    counts the DELTA rows (a full entry's counts its snapshot).
    Requires an existing chain (a first commit must be a full snapshot
    so every version resolves to complete content)."""
    vs = versions(path)
    if not vs:
        raise ValueError(
            f"cannot append at {path}: no committed base snapshot — the "
            "first commit must be write_version (a full snapshot)"
        )
    return _commit(df, path, "append")


def _chain(vs: list[dict], entry: dict, path: str) -> list[dict]:
    """Manifest entries composing ``entry``'s logical content: the
    nearest full snapshot at or before it plus every append between,
    in commit order."""
    i = vs.index(entry)
    for j in range(i, -1, -1):
        if _mode(vs[j]) == "full":
            return vs[j : i + 1]
    raise ValueError(
        f"version {entry['version']} at {path} has no full base snapshot "
        "in the manifest — its chain was expired; resync from a full "
        "snapshot"
    )


def _entry(vs: list[dict], path: str, version: int | None) -> dict:
    if not vs:
        raise FileNotFoundError(f"no committed versions at {path}")
    if version is None:
        return vs[-1]
    match = [v for v in vs if v["version"] == version]
    if not match:
        raise ValueError(f"version {version} not committed at {path}")
    return match[0]


def read_version(
    spark: SparkSession, path: str, version: int | None = None
) -> DataFrame:
    """Time-travel read: the given committed version, or the latest.
    An append version resolves to its full chain (base snapshot plus
    every delta up to it)."""
    vs = versions(path)
    entry = _entry(vs, path, version)
    dirs = [os.path.join(path, e["dir"]) for e in _chain(vs, entry, path)]
    return spark.read.parquet(*dirs)


def incremental_scan(
    spark: SparkSession,
    path: str,
    from_version: int,
    to_version: int | None = None,
) -> DataFrame:
    """Change-data-feed read: exactly the rows committed AFTER
    ``from_version`` up to and including ``to_version`` (default:
    latest), with a ``_commit_version`` column stamping each row's
    commit. Reads ONLY the delta directories — O(rows appended), never
    a snapshot re-scan — which is what makes a downstream sync
    affordable against a 100 TB table.

    Every version in the range must be an append: a full snapshot in
    between is a rewrite (rows may have been dropped or changed), so
    the incremental lineage is broken and the consumer must resync
    from that snapshot — this fails loudly rather than returning a
    silently-wrong delta."""
    from pyspark.sql import functions as F

    vs = versions(path)
    start = _entry(vs, path, from_version)  # validates it is committed
    end = _entry(vs, path, to_version)
    if end["version"] < start["version"]:
        raise ValueError(
            f"to_version {end['version']} precedes from_version "
            f"{start['version']} at {path}"
        )
    rng = [
        e for e in vs if start["version"] < e["version"] <= end["version"]
    ]
    rewrites = [e["version"] for e in rng if _mode(e) != "append"]
    if rewrites:
        raise ValueError(
            f"incremental scan {start['version']}..{end['version']} at "
            f"{path} crosses full-snapshot rewrite(s) {rewrites}: "
            "incremental lineage is broken — resync from the rewrite"
        )
    if not rng:  # consumer already caught up: empty delta, same schema
        return (
            spark.read.parquet(os.path.join(path, start["dir"]))
            .limit(0)
            .withColumn("_commit_version", F.lit(None).cast("long"))
        )
    out = None
    for e in rng:
        part = spark.read.parquet(os.path.join(path, e["dir"])).withColumn(
            "_commit_version", F.lit(e["version"]).cast("long")
        )
        out = part if out is None else out.unionByName(part)
    return out


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
    # a chain expires only as a unit: if the oldest retained version is
    # an append, its content NEEDS the preceding full snapshot and the
    # appends between — extend retention to the chain base (vacuum
    # reclaims less, never a directory a retained version resolves to)
    if _mode(keep[0]) != "full":
        base_i = next(
            (i for i in range(len(drop) - 1, -1, -1) if _mode(drop[i]) == "full"),
            0,
        )
        drop, keep = drop[:base_i], drop[base_i:] + keep
        if not drop:
            return []
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

"""binaryfile_corpus_ingest landing-path injection.

The landing prefix must be deployable to shared storage without
editing the query: ``SPARK_GRAFT_LANDING_DIR`` points the
executor-side file landing at an operator-chosen prefix (object store
/ NFS on a real cluster), with the local-tempdir default preserved.
The r07 loud-failure guard (reader must see every landed file) is
re-exercised under the injected path.
"""

from __future__ import annotations

import os

import pytest

SF = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")

if not os.path.isdir(SF):  # pragma: no cover - machine without fixtures
    pytest.skip(f"fixture dir {SF} missing", allow_module_level=True)


def _run(spark):
    from end_to_end_database_pipeline_project_spark.plans import load_all  # noqa
    from end_to_end_database_pipeline_project_spark.plans.registry import QUERIES

    return QUERIES["binaryfile_corpus_ingest"](spark, SF)


def test_injected_landing_dir_is_used_and_results_unchanged(
    spark, tmp_path, monkeypatch
):
    land = tmp_path / "shared_landing"
    monkeypatch.setenv("SPARK_GRAFT_LANDING_DIR", str(land))
    injected = {tuple(r) for r in _run(spark).collect()}
    # files actually landed under the injected prefix
    subdirs = [p for p in land.iterdir() if p.is_dir()]
    assert len(subdirs) == 1 and subdirs[0].name.startswith("blob_land_")
    n_files = len([f for f in subdirs[0].iterdir() if f.suffix == ".txt"])
    assert n_files == len(injected) > 0

    monkeypatch.delenv("SPARK_GRAFT_LANDING_DIR")
    default = {tuple(r) for r in _run(spark).collect()}
    assert injected == default


def test_unshared_landing_fails_loudly(spark, tmp_path, monkeypatch):
    """If the reader can't see every landed file (non-shared storage:
    executors wrote locally, the driver's listing misses some), the
    query must raise its diagnostic, never return a silent partial.
    Simulated by truncating the reader-side listing of the landing
    dir — exactly the observable a non-shared filesystem produces."""
    import os as _os

    land = tmp_path / "unshared_landing"
    monkeypatch.setenv("SPARK_GRAFT_LANDING_DIR", str(land))
    real_listdir = _os.listdir

    def truncated(path=".", *a, **kw):
        out = real_listdir(path, *a, **kw)
        if str(path).startswith(str(land)) and any(
            f.endswith(".txt") for f in out
        ):
            return [f for f in out if f.endswith(".txt")][1:]  # lose one file
        return out

    monkeypatch.setattr("os.listdir", truncated)
    with pytest.raises(RuntimeError, match="share the landing filesystem"):
        _run(spark)

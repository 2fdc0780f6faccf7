"""source_overlap_matrix must be non-vacuous where overlap exists.

At sf0.01 the fixture corpus has zero cross-source verbatim duplicates,
so the driver's oracle check is vacuously green (0 == 0 rows). sf0.1
has real overlap (8 shared hashes, mirror-verified), but the permanent
pin is this synthetic fixture: known cross-source duplicates with a
hand-computed expected matrix, compared against both the Spark plan and
the registered DuckDB oracle. A regression that silently empties the
join can no longer hide behind an overlap-free gate corpus.
"""

from __future__ import annotations

import duckdb
import pytest

from tools.check_oracle import compare


@pytest.fixture(scope="module")
def overlap_dir(spark, tmp_path_factory):
    d = tmp_path_factory.mktemp("overlap")
    rows = [
        # text_a appears in web+books+code; text_b in web+books;
        # text_c unique to web; every source also has unique filler
        (1, "shared text alpha common", "en", "web", 24),
        (2, "shared text alpha common", "en", "books", 24),
        (3, "shared text alpha common", "en", "code", 24),
        (4, "shared text beta common", "en", "web", 23),
        (5, "shared text beta common", "en", "books", 23),
        (6, "unique web only", "en", "web", 15),
        (7, "unique books only", "en", "books", 17),
        (8, "unique code only", "en", "code", 16),
        # same text twice WITHIN one source: distinct() must collapse
        # it so per-source sizes count content, not deliveries
        (9, "unique web only", "en", "web", 15),
    ]
    spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    ).coalesce(1).write.parquet(str(d / "documents.parquet"))
    return str(d)


def test_synthetic_overlap_matrix(spark, overlap_dir):
    from end_to_end_database_pipeline_project_spark.plans import load_all  # noqa
    from end_to_end_database_pipeline_project_spark.plans.registry import (
        ORACLES,
        QUERIES,
    )

    name = "source_overlap_matrix"
    sdf = QUERIES[name](spark, overlap_dir).toPandas()
    con = duckdb.connect()
    # Spark writes the table as a directory of part files
    con.sql(
        "CREATE VIEW documents AS SELECT * FROM "
        f"'{overlap_dir}/documents.parquet/*.parquet'"
    )
    odf = con.sql(ORACLES[name]).df()
    assert not compare(name, sdf, odf)
    got = {
        (r.source_a, r.source_b): (r.n_shared, r.content_jaccard)
        for r in sdf.itertuples()
    }
    # sizes (distinct content): web=3, books=3, code=2
    assert got == {
        ("books", "web"): (2, round(2 / (3 + 3 - 2), 6)),
        ("books", "code"): (1, round(1 / (3 + 2 - 1), 6)),
        ("code", "web"): (1, round(1 / (2 + 3 - 1), 6)),
    }


SF01 = "/root/testdata/sf0.1"


@pytest.mark.skipif(not __import__("os").path.isdir(SF01), reason="sf0.1 missing")
def test_sf01_overlap_is_nonempty(spark):
    # the r06 verdict's ask: the sf0.01 gate row is vacuously green
    # (0 == 0 rows); prove the query is non-degenerate one SF up, so
    # the oracle check exercises the join somewhere real
    from end_to_end_database_pipeline_project_spark.plans import load_all  # noqa
    from end_to_end_database_pipeline_project_spark.plans.registry import QUERIES

    n = QUERIES["source_overlap_matrix"](spark, SF01).count()
    assert n > 0, "sf0.1 corpus lost its cross-source duplicates"

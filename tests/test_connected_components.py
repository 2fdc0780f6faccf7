"""Connected components: transitive closure semantics + convergence."""

from __future__ import annotations

from end_to_end_database_pipeline_project_spark.operators.dedup import (
    connected_components,
)


def _run(spark, node_ids, edge_pairs, **kw):
    nodes = spark.createDataFrame([(n,) for n in node_ids], "doc_id long")
    edges = spark.createDataFrame(
        [(a, b) for a, b in edge_pairs], "doc_a long, doc_b long"
    )
    out = connected_components(nodes, edges, **kw)
    return {r["doc_id"]: r["component_id"] for r in out.collect()}


def test_transitive_chain_collapses(spark):
    # 1-2, 2-3 chain: 3 joins 1's component though (1,3) never paired;
    # 4-5 separate pair; 6 singleton keeps its own label
    got = _run(spark, [1, 2, 3, 4, 5, 6], [(1, 2), (2, 3), (4, 5)])
    assert got == {1: 1, 2: 1, 3: 1, 4: 4, 5: 4, 6: 6}


def test_long_path_needs_multiple_rounds(spark):
    # a 6-node path labels propagate one hop per round — exercises the
    # iteration + early-exit logic well past round 1
    path = [(i, i + 1) for i in range(1, 6)]
    got = _run(spark, list(range(1, 7)), path)
    assert set(got.values()) == {1}


def test_max_iter_caps_propagation(spark):
    # with a single round allowed, the far end of the path cannot have
    # reached the minimum label yet (documents why max_iter exists)
    path = [(i, i + 1) for i in range(1, 6)]
    got = _run(spark, list(range(1, 7)), path, max_iter=1)
    assert got[6] == 5  # only one hop of propagation

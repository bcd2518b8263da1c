"""connected_components / dedup_survivors unit tests."""

from __future__ import annotations

import pytest

from chapterhousedb_spark.operators.cluster import (
    connected_components,
    dedup_survivors,
)


def _comps(spark, edges, nodes=None, **kw):
    e = spark.createDataFrame(edges or [], "id_a long, id_b long")
    n = spark.createDataFrame([(x,) for x in nodes], "doc_id long") if nodes else None
    df = connected_components(e, nodes=n, **kw)
    return {r["id"]: r["component"] for r in df.collect()}


def test_chain_needs_multiple_rounds(spark):
    # path 1-2-3-4-5: diameter 4, forces several propagation rounds
    got = _comps(spark, [(1, 2), (2, 3), (3, 4), (4, 5)])
    assert got == {1: 1, 2: 1, 3: 1, 4: 1, 5: 1}


def test_two_components_and_orientation(spark):
    # edges in mixed orientation + a duplicate edge
    got = _comps(spark, [(2, 1), (1, 2), (3, 2), (10, 11)])
    assert got == {1: 1, 2: 1, 3: 1, 10: 10, 11: 10}


def test_singletons_via_nodes(spark):
    got = _comps(spark, [(1, 2)], nodes=[1, 2, 7, 9])
    assert got == {1: 1, 2: 1, 7: 7, 9: 9}


def test_empty_edges_all_singletons(spark):
    got = _comps(spark, [], nodes=[4, 5, 6])
    assert got == {4: 4, 5: 5, 6: 6}


def test_max_iters_raises_on_long_chain(spark):
    edges = [(i, i + 1) for i in range(1, 9)]
    e = spark.createDataFrame(edges, "id_a long, id_b long")
    with pytest.raises(RuntimeError, match="did not converge"):
        connected_components(e, max_iters=2)


def test_survivors_sizes(spark):
    docs = spark.createDataFrame([(i,) for i in range(1, 8)], "doc_id long")
    pairs = spark.createDataFrame([(1, 2), (2, 3), (5, 6)], "id_a long, id_b long")
    got = {
        r["doc_id"]: r["cluster_size"]
        for r in dedup_survivors(docs, pairs).collect()
    }
    # clusters: {1,2,3} -> 1, {5,6} -> 5, singletons 4 and 7
    assert got == {1: 3, 5: 2, 4: 1, 7: 1}

"""operators/graph: connected components + shared-shingle dup clusters."""

import pytest
from pyspark.sql import Row

from orientdb_neo4j_importer_plugin_spark.operators.graph import (
    connected_components,
    dup_components,
    shared_shingle_edges,
)


def _edges(spark, pairs):
    return spark.createDataFrame(
        [Row(u=a, v=b) for a, b in pairs], "u long, v long"
    )


def test_connected_components_transitive_chain(spark):
    # 1-2-3-4 chain + isolated pair 10-11: labels must propagate
    # transitively, not just to direct neighbors
    got = {
        r["vertex"]: r["component"]
        for r in connected_components(
            _edges(spark, [(2, 1), (2, 3), (4, 3), (10, 11)])
        ).collect()
    }
    assert got == {1: 1, 2: 1, 3: 1, 4: 1, 10: 10, 11: 10}


def test_connected_components_max_iter_guard(spark):
    with pytest.raises(RuntimeError, match="converge"):
        # a 6-chain needs more than 1 round; the guard must raise, never
        # return half-merged components
        connected_components(
            _edges(spark, [(1, 2), (2, 3), (3, 4), (4, 5), (5, 6)]),
            max_iter=1,
        )


def test_dup_components_clusters_and_keep_policy(spark):
    base = "alpha beta gamma delta epsilon zeta eta theta"
    docs = spark.createDataFrame(
        [
            Row(doc_id=0, text=base + " tail_a"),
            Row(doc_id=1, text=base + " tail_b"),     # shares 8-gram with 0
            Row(doc_id=2, text="mid " + base),        # shares with 0 and 1
            Row(doc_id=3, text="one two three four five six seven eight"),
            Row(doc_id=4, text="one two three four five six seven eight"),
            Row(doc_id=5, text="no overlap with anything here at all ok"),
        ]
    )
    got = {
        r["doc_id"]: r["component_id"]
        for r in dup_components(docs).collect()
    }
    # {0,1,2} transitively clustered, {3,4} exact dup, 5 absent (singleton)
    assert got == {0: 0, 1: 0, 2: 0, 3: 3, 4: 3}
    keep = sorted(d for d, c in got.items() if d == c)
    assert keep == [0, 3]


def test_shared_shingle_edges_df_cap_drops_boilerplate(spark):
    boiler = "common shared boilerplate phrase used by every single doc"
    docs = spark.createDataFrame(
        [Row(doc_id=i, text=boiler) for i in range(6)]
    )
    # with the cap below the group size, the shingle is boilerplate: no edges
    assert shared_shingle_edges(docs, max_df=5).count() == 0
    # raising the cap re-admits it: all 15 pairs of the 6-clique
    assert shared_shingle_edges(docs, max_df=6).count() == 15

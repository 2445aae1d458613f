"""Connected-components correctness on a known graph + convergence."""

from __future__ import annotations

from mta_rtf_dbt_spark.operators.graph import connected_components


def test_cc_known_graph(spark):
    # components: {1,2,3,4} (chain), {10,11}, {20,21,22} (triangle)
    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (10, 11), (20, 21), (21, 22), (20, 22)],
        "src long, dst long",
    )
    out = {r.node: r.component for r in connected_components(edges).collect()}
    assert out == {1: 1, 2: 1, 3: 1, 4: 1, 10: 10, 11: 10, 20: 20, 21: 20, 22: 20}


def test_cc_long_chain_converges(spark):
    # a 30-node chain needs ~diameter rounds of pure min-propagation;
    # max_iter must cover it and the labels must all collapse to 0
    edges = spark.createDataFrame(
        [(i, i + 1) for i in range(30)], "src long, dst long"
    )
    out = {r.node: r.component for r in connected_components(edges, max_iter=40).collect()}
    assert set(out.values()) == {0}
    assert len(out) == 31

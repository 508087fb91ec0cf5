"""Connected-components tests: chain graphs need multiple propagation
rounds (diameter > 1), which the sf-corpus near-dup cliques never
exercise; also verifies disjoint clusters stay disjoint."""

from __future__ import annotations

from gmall_flink_yb_spark.functions.dedup import connected_components


def test_chain_and_disjoint_components(spark):
    # 1-2-3-4-5 chain (diameter 4 => ~4 rounds) + {10,11} + {20,21,22} clique
    pairs = spark.createDataFrame(
        [
            (1, 2), (2, 3), (3, 4), (4, 5),
            (10, 11),
            (20, 21), (21, 22), (20, 22),
        ],
        "id_a long, id_b long",
    )
    got = {r.node: r.component for r in connected_components(pairs).collect()}
    assert got == {
        1: 1, 2: 1, 3: 1, 4: 1, 5: 1,
        10: 10, 11: 10,
        20: 20, 21: 20, 22: 20,
    }


def test_reversed_edge_direction_irrelevant(spark):
    # min id on the b-side: label must still flow against edge direction
    pairs = spark.createDataFrame([(5, 1), (5, 3)], "id_a long, id_b long")
    got = {r.node: r.component for r in connected_components(pairs).collect()}
    assert got == {1: 1, 3: 1, 5: 1}

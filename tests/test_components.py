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


def test_star_matches_label_propagation(spark):
    from gmall_flink_yb_spark.functions.dedup import connected_components_star

    pairs = spark.createDataFrame(
        [
            (1, 2), (2, 3), (3, 4), (4, 5),
            (10, 11),
            (20, 21), (21, 22), (20, 22),
            (7, 30), (30, 8),  # min in the middle of a chain
        ],
        "id_a long, id_b long",
    )
    lp = {r.node: r.component for r in connected_components(pairs).collect()}
    st = {
        r.node: r.component
        for r in connected_components_star(pairs).collect()
    }
    assert st == lp


def test_star_handles_long_path_in_log_rounds(spark):
    """A 200-node path has diameter 199: min-label propagation would need
    199 rounds (its max_iterations=50 raises — too expensive to demonstrate
    in CI), while the star rewrites contract it within 15 — THE reason the
    variant exists."""
    from gmall_flink_yb_spark.functions.dedup import connected_components_star

    n = 200
    pairs = spark.createDataFrame(
        [(i, i + 1) for i in range(1, n)], "id_a long, id_b long"
    )
    got = {
        r.node: r.component
        for r in connected_components_star(pairs, max_iterations=15).collect()
    }
    assert got == {i: 1 for i in range(1, n + 1)}


def test_star_random_graph_parity(spark):
    from random import Random

    from gmall_flink_yb_spark.functions.dedup import connected_components_star

    rng = Random(42)
    edges = [
        (rng.randrange(120), rng.randrange(120)) for _ in range(130)
    ]
    edges = [(a, b) for a, b in edges if a != b]
    pairs = spark.createDataFrame(edges, "id_a long, id_b long")
    lp = {r.node: r.component for r in connected_components(pairs).collect()}
    st = {
        r.node: r.component
        for r in connected_components_star(pairs).collect()
    }
    assert st == lp


def test_caller_session_aqe_untouched(spark):
    """The CC loops disable AQE only in their private session — the
    caller's conf must never flip mid-loop (shared-session safety)."""
    from gmall_flink_yb_spark.functions.dedup import connected_components_star

    spark.conf.set("spark.sql.adaptive.enabled", "true")
    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (10, 11)], "id_a long, id_b long"
    )
    lp = connected_components(pairs)
    assert spark.conf.get("spark.sql.adaptive.enabled") == "true"
    st = connected_components_star(pairs)
    assert spark.conf.get("spark.sql.adaptive.enabled") == "true"
    want = {1: 1, 2: 1, 3: 1, 10: 10, 11: 10}
    assert {r.node: r.component for r in lp.collect()} == want
    assert {r.node: r.component for r in st.collect()} == want


def test_durable_checkpoint_mode(spark, tmp_path):
    """With a reliable checkpoint dir set, both CC variants must route
    lineage truncation through df.checkpoint (files appear under the dir)
    and still produce correct components — the fault-tolerant cluster
    mode of _truncate_lineage."""
    import os

    from gmall_flink_yb_spark.functions.dedup import connected_components_star

    sc = spark.sparkContext
    assert not sc.getCheckpointDir(), "fixture session should start bare"
    ckpt = str(tmp_path / "ckpt")
    sc.setCheckpointDir(ckpt)
    try:
        pairs = spark.createDataFrame(
            [(1, 2), (2, 3), (3, 4), (20, 21)], "id_a long, id_b long"
        )
        want = {1: 1, 2: 1, 3: 1, 4: 1, 20: 20, 21: 20}
        lp = {r.node: r.component for r in connected_components(pairs).collect()}
        st = {
            r.node: r.component
            for r in connected_components_star(pairs).collect()
        }
        assert lp == want and st == want
        written = [
            os.path.join(root, f)
            for root, _, files in os.walk(ckpt)
            for f in files
        ]
        assert written, "reliable checkpoint dir was never written to"
    finally:
        # scala setCheckpointDir has no unset; clear via the underlying option
        getattr(sc._jsc.sc(), "checkpointDir_$eq")(
            sc._jvm.scala.Option.empty()
        )


def test_select_canonical_keep_best(spark):
    from pyspark.sql import Row

    from gmall_flink_yb_spark.functions.dedup import select_canonical

    docs = spark.createDataFrame(
        [
            Row(doc_id=1, n_chars=10),
            Row(doc_id=2, n_chars=50),   # best of cluster {1,2,3}
            Row(doc_id=3, n_chars=50),   # tie -> smaller id 2 wins
            Row(doc_id=9, n_chars=1),    # singleton: always kept
        ]
    )
    comps = spark.createDataFrame(
        [Row(node=1, component=1), Row(node=2, component=1),
         Row(node=3, component=1)]
    )
    got = {
        r["doc_id"]: (r["component"], r["keep"])
        for r in select_canonical(docs, comps).collect()
    }
    assert got == {1: (1, 0), 2: (1, 1), 3: (1, 0), 9: (9, 1)}


def test_empty_pairs_returns_empty_not_nonconvergence(spark):
    # zero-duplicates corpus: no pairs -> empty component table, NOT a
    # spurious "did not converge" (sum over zero rows is NULL, which the
    # convergence check must treat as 0 changes)
    from gmall_flink_yb_spark.functions.dedup import (
        connected_components,
        connected_components_star,
    )

    empty = spark.createDataFrame([], "id_a long, id_b long")
    assert connected_components(empty).count() == 0
    assert connected_components_star(empty).count() == 0


def test_star_cc_bad_column_cleans_up_loop_state(spark):
    """An analysis error on a wrong id column must still drop the loop
    session's temp view and persists (setup now lives inside try)."""
    import pytest as _pytest

    from gmall_flink_yb_spark.functions.dedup import connected_components_star

    pairs = spark.createDataFrame([(1, 2)], ["id_a", "id_b"])
    before = {
        v.name for v in spark.catalog.listTables("global_temp")
    } if spark.catalog.databaseExists("global_temp") else set()
    with _pytest.raises(Exception):
        connected_components_star(pairs, id_a="no_such_col", id_b="id_b")
    after = {
        v.name for v in spark.catalog.listTables("global_temp")
    } if spark.catalog.databaseExists("global_temp") else set()
    assert after <= before  # no leaked _loop_ccs_* views

"""Cache-lifetime regression tests (ADVICE r4): the ownership tag lives on
the Python DataFrame wrapper, so derivations (.select, joins, wrapping
builders) used to drop it and leak the builders' persisted subtrees for
the whole session. Fixed two ways — connected_components* release their
input's tagged caches once the eager label loop has consumed them, and
q_ann_incremental carries the tag through its rename — verified here by
the only observable that matters: the JVM's persistent-RDD registry is
empty after release."""

from __future__ import annotations

import pytest

from gmall_flink_yb_spark.functions.cacheutil import release_cache
from gmall_flink_yb_spark.queries import QUERIES

SF_DIR = "/root/testdata/sf0.001"


def _n_persistent(spark) -> int:
    return spark.sparkContext._jsc.getPersistentRDDs().size()


@pytest.mark.parametrize(
    "name",
    ["dedup_clusters", "dedup_canonical", "leakage_safe_split",
     "ann_incremental", "dedup_jaccard_prefix", "dedup_incremental",
     "unigram_lm", "source_overlap", "basket_pairs"],
)
def test_no_cached_rdds_survive_release(spark, name):
    spark.catalog.clearCache()
    # hermetic precondition: other test FILES legitimately leave
    # localCheckpoint blocks behind (they don't release_cache results
    # they only collect once), and clearCache can't see RDD-level
    # persists — force-free them so this test measures ITS query only
    jmap = spark.sparkContext._jsc.getPersistentRDDs()
    for rid in list(jmap.keySet().toArray()):
        jrdd = jmap.get(rid)
        if jrdd is not None:
            jrdd.unpersist(False)
    assert _n_persistent(spark) == 0
    df = QUERIES[name](spark, SF_DIR)
    df.count()
    release_cache(df)
    assert _n_persistent(spark) == 0, (
        f"{name} leaked persisted RDDs past release_cache"
    )

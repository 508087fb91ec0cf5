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


def _persistent_ids(spark) -> set[int]:
    jmap = spark.sparkContext._jsc.getPersistentRDDs()
    return {int(i) for i in jmap.keySet().toArray()}


@pytest.mark.parametrize(
    "name",
    ["dedup_clusters", "dedup_canonical", "leakage_safe_split",
     "ann_incremental", "dedup_jaccard_prefix", "dedup_incremental",
     "unigram_lm", "source_overlap", "basket_pairs",
     # ADVICE r8: these three dropped the hot-gram hatch's cache tag on
     # their final .select/.orderBy; hotgram force-fires the hatch so it
     # ALWAYS persists — the live regression for the carry_cache fix
     "substring_dedup_hotgram", "dup_spans", "substring_dedup"],
)
def test_no_cached_rdds_survive_release(spark, name):
    # Measure ONLY this query's pins: snapshot the registry and assert no
    # NEW ids survive release. The r6 version force-unpersisted EVERY
    # pre-existing RDD (including localCheckpoint blocks other test files'
    # session-scoped fixtures still depend on — truncated lineage is not
    # recomputable), which is exactly the context-wide-release hazard the
    # cacheutil HAZARD note warns about (ADVICE r6). clearCache only drops
    # SQL-cache entries, which ARE recomputable, so it stays.
    spark.catalog.clearCache()
    before = _persistent_ids(spark)
    df = QUERIES[name](spark, SF_DIR)
    df.count()
    release_cache(df)
    leaked = _persistent_ids(spark) - before
    assert not leaked, (
        f"{name} leaked persisted RDDs past release_cache: {sorted(leaked)}"
    )

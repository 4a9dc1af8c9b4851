"""Persisted operator intermediates must not outlive their query.

Round-5 structural guarantee: registry-wrapped queries ``adopt`` their
staged persists onto the result DataFrame, so a plain
``QUERIES[name](spark, sf)`` + action leaks nothing once the caller
drops the result — no explicit ``cache.release()`` required.  Raw
operator functions still stage, and ``release()`` still clears them.
"""

from __future__ import annotations

import gc

import pytest

from map_reduce_framework_spark import cache
from map_reduce_framework_spark.plans import registry

from .conftest import SF_DIR

# the queries whose operators persist intermediates (posting lists,
# MinHash/SimHash signature tables, embedding matrices)
CACHE_HEAVY = [
    "dedup_ngram_jaccard",
    "dedup_minhash_lsh",
    "dedup_simhash",
    "ann_ivf_kmeans",
    "kmeans_embeddings",
    # round-6 third batch: Bloom corpus key set, BPE vocab table
    "dedup_incremental_bloom",
    "bpe_train_merges",
    "bpe_segment_docs",
    "dedup_incremental_minhash",
    # NOTE: the indexed twin persists nothing per-run (the index is a
    # table); deliberately not listed here
]


def _n_persistent(spark) -> int:
    return spark.sparkContext._jsc.sc().getPersistentRDDs().size()


@pytest.fixture(autouse=True)
def _zero_persistent_baseline(spark):
    """Deterministic baseline: earlier test modules (graph peels, CC
    pipelines) leave ``localCheckpoint`` RDD blocks whose cleanup is
    ASYNC (driver GC → ContextCleaner), so the pre-test persistent-RDD
    count is a race, not a constant.  The property under test is
    "THIS query's caches don't outlive its result" — purge every
    persistent RDD up front so the assertions measure exactly that."""
    # py4j exposes the java.util.Map as a dict-like JavaMap
    jmap = spark.sparkContext._jsc.getPersistentRDDs()
    for jrdd in list(jmap.values()):
        jrdd.unpersist()
    spark.catalog.clearCache()
    cache.release()
    assert _n_persistent(spark) == 0
    yield


@pytest.mark.parametrize("name", CACHE_HEAVY)
def test_structural_release_without_explicit_call(spark, name):
    df = registry.QUERIES[name](spark, SF_DIR)
    df.count()
    assert _n_persistent(spark) > 0, f"{name}: expected a tracked persist"
    # the caller drops the result — adopted caches must go with it,
    # with NO cache.release() call anywhere
    del df
    gc.collect()
    assert _n_persistent(spark) == 0, f"{name}: cache outlived the result"


def test_raw_operator_persists_clear_on_release(spark):
    from map_reduce_framework_spark.operators import dedup

    dedup.dedup_minhash_lsh(spark, SF_DIR).count()
    assert _n_persistent(spark) > 0, "expected a staged persist"
    assert cache.release() > 0
    assert _n_persistent(spark) == 0, "cache survived release()"


def test_release_is_idempotent(spark):
    assert cache.release() == 0


def test_failed_query_does_not_leak_staged_persists_to_next(spark):
    """A query that raises AFTER staging persists must not hand its
    caches to the next query's result (round-6 ADVICE): the registry
    wrapper releases staged entries on exception."""
    from map_reduce_framework_spark.plans.registry import _structural_release

    def failing(spark_, sf_dir_):
        from map_reduce_framework_spark.operators import dedup

        e = dedup._shingle_exploded(spark_, sf_dir_)  # stages a persist
        e.count()
        raise RuntimeError("boom after staging")

    with pytest.raises(RuntimeError, match="boom"):
        _structural_release(failing)(spark, SF_DIR)
    # nothing staged for the NEXT query to adopt, nothing left persisted
    assert cache._TRACKED == []
    assert _n_persistent(spark) == 0, "failed query leaked its persist"

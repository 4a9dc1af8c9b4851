"""Persisted operator intermediates must be releasable: after a query
runs and ``cache.release()`` is called, no persistent RDD survives."""

from __future__ import annotations

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
]


def _n_persistent(spark) -> int:
    return spark.sparkContext._jsc.sc().getPersistentRDDs().size()


@pytest.mark.parametrize("name", CACHE_HEAVY)
def test_release_clears_persisted_intermediates(spark, name):
    registry.QUERIES[name](spark, SF_DIR).count()
    assert _n_persistent(spark) > 0, f"{name}: expected a tracked persist"
    cache.release()
    assert _n_persistent(spark) == 0, f"{name}: cache survived release()"


def test_release_is_idempotent(spark):
    assert cache.release() == 0

"""The cache-release contract (relational.py module doc, round-9 item 6).

Operator builders persist intermediates that the returned lazy frame
consumes from several branches; those persists cannot be released inside
the builder, so the contract is caller-side `spark.catalog.clearCache()`
after the action. This test pins that the contract actually releases
everything the persist-heavy operators pin: after running their actions
and clearing the cache, no NEW persistent RDD survives.
"""

from __future__ import annotations

import gc

from messikinesisprovider_spark.registry import all_specs

# Persist-heavy, non-loop operators (the round-8/9 persists under audit).
_QUERIES = [
    "dedup_exact_substring",
    "negative_sampling_hash",
    "rfm_segmentation",
    "bradley_terry_two_rounds",
    "sketch_quantile_digest_merge",
]


def _persistent_ids(spark) -> set[int]:
    m = spark.sparkContext._jsc.getPersistentRDDs()
    return {int(k) for k in m.keySet().toArray()}


def test_clearcache_releases_all_persists(spark, sf_dir):
    spark.catalog.clearCache()
    gc.collect()
    before = _persistent_ids(spark)
    specs = all_specs()
    for name in _QUERIES:
        specs[name].fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
    # the operators really do persist (otherwise this test pins nothing)
    assert _persistent_ids(spark) - before
    spark.catalog.clearCache()
    gc.collect()
    leaked = _persistent_ids(spark) - before
    assert not leaked, f"persisted RDDs survive clearCache: {leaked}"

"""Persist-lifecycle hygiene: no operator leaves orphaned blocks in the
Spark block cache (round-4 verdict item 1).

Spark's CacheManager holds persisted data until an explicit unpersist —
a serving session that leaked one persisted frame per call would
accumulate executor storage it can never reclaim.  Three guarantees are
pinned here:

1. a serving call (``ivfpq_topk_indexed``) leaves the block cache at its
   pre-call size;
2. the ``plan_cache`` memoizers in ``plans/queries.py`` unpersist on LRU
   eviction, so >maxsize corpus touches keep the cache bounded;
3. ``clear_plan_caches`` returns the block cache to its baseline.
"""

from __future__ import annotations

import shutil

import pytest

from nomenklatura_spark.plans.cache import PlanCache, clear_plan_caches


def _n_persistent(spark) -> int:
    """CacheManager entry count — exactly the persisted-DataFrame
    population (an unpersist-less persist shows up here forever).
    Deliberately NOT ``getPersistentRDDs``: that view also contains
    localCheckpoint blocks, which release asynchronously when other
    tests' plans are garbage-collected and made the counts drift
    mid-test for reasons unrelated to the operator under test."""
    return spark._jsparkSession.sharedState().cacheManager().cachedData().size()


def test_ivfpq_serving_call_leaves_cache_clean(spark, sf_dir, tmp_path):
    """The production serving path: build an at-rest index, serve one
    query batch, and assert the block cache is exactly where it started
    — codebooks are driver-local relations and the probe list is
    collected once, not persisted (ann/pq.py)."""
    from pyspark.sql import functions as F

    from nomenklatura_spark.ann.pq import ivfpq_topk_indexed, write_ivfpq_index
    from nomenklatura_spark.session import load_table

    emb = load_table(spark, sf_dir, "embeddings")
    path = str(tmp_path / "ivfpq")
    before = _n_persistent(spark)
    write_ivfpq_index(emb, path, n_cells=8, m=8, pq_k=8, n_iter=1)
    assert _n_persistent(spark) == before, "index build leaked persists"
    queries = emb.where(F.col("vec_id") % 50 == 0)
    served = ivfpq_topk_indexed(spark, path, queries, k=3, n_probe=4, rerank=10)
    rows = served.collect()
    assert len(rows) > 0
    assert _n_persistent(spark) == before, "serving call leaked persists"


def test_trained_codebook_paths_leave_cache_clean(spark, sf_dir):
    """In-query training (the oracle contract shape) must not pin the
    trained codebooks either: ivf_topk / pq_topk / ivfpq_topk /
    semantic_dup_pairs_hier all train-and-materialize locally."""
    from pyspark.sql import functions as F

    from nomenklatura_spark.ann.ivf import ivf_topk
    from nomenklatura_spark.ann.pq import ivfpq_topk, pq_topk
    from nomenklatura_spark.dedup.semantic import semantic_dup_pairs_hier
    from nomenklatura_spark.session import load_table

    emb = load_table(spark, sf_dir, "embeddings")
    queries = emb.where(F.col("vec_id") % 100 == 0)
    before = _n_persistent(spark)
    ivf_topk(emb, queries, k=3, n_centroids=4, n_probe=2, n_iter=1).collect()
    assert _n_persistent(spark) == before
    pq_topk(emb, queries, k=3, m=4, n_centroids=8, n_iter=1).collect()
    assert _n_persistent(spark) == before
    ivfpq_topk(
        emb, queries, k=3, n_cells=4, n_probe=2, m=4, pq_k=8, n_iter=1, rerank=10
    ).collect()
    assert _n_persistent(spark) == before
    semantic_dup_pairs_hier(emb, n_coarse=3, n_fine=3, n_iter=1).count()
    assert _n_persistent(spark) == before


@pytest.fixture()
def corpus_copies(sf_dir, tmp_path):
    """Nine distinct corpus directories (copies of the smallest SF) —
    enough to overflow the maxsize=8 memoizers."""
    dirs = []
    for i in range(9):
        d = tmp_path / f"sf-copy-{i}"
        d.mkdir()
        for table in ("part", "customer", "supplier"):
            shutil.copy(f"{sf_dir}/{table}.parquet", d / f"{table}.parquet")
        dirs.append(str(d))
    return dirs


def test_plan_cache_eviction_unpersists(spark, corpus_copies):
    """>maxsize corpus touches on a queries.py memoizer: the LRU stays
    bounded AND the evicted corpus's persisted blocks are released —
    the lru_cache predecessor kept them pinned forever."""
    from nomenklatura_spark.plans.queries import _er_entries_cached

    # baseline AFTER a full clear: earlier tests populate other plan
    # caches, and the final clear_plan_caches() below releases those too
    clear_plan_caches()
    baseline = _n_persistent(spark)
    for d in corpus_copies:  # 9 touches, maxsize 8
        _er_entries_cached(spark, d).count()
    assert len(_er_entries_cached.cache) == 8
    # 8 live persisted frames; the evicted first corpus released its block
    assert _n_persistent(spark) == baseline + 8
    # a re-touch of the evicted corpus rebuilds (and evicts the next LRU)
    _er_entries_cached(spark, corpus_copies[0]).count()
    assert len(_er_entries_cached.cache) == 8
    assert _n_persistent(spark) == baseline + 8
    clear_plan_caches()
    assert _n_persistent(spark) == baseline


def test_clear_plan_caches_releases_tuple_values(spark, sf_dir):
    """Memoizers returning tuples of frames (_ann_codebooks_cached,
    _er_match_inputs_cached) release every member on clear."""
    from nomenklatura_spark.plans.queries import _ann_codebooks_cached

    clear_plan_caches()
    baseline = _n_persistent(spark)
    ivf16, books, sem = _ann_codebooks_cached(spark, sf_dir)
    ivf16.count(), books.count(), sem.count()
    assert _n_persistent(spark) == baseline + 3
    clear_plan_caches()
    assert _n_persistent(spark) == baseline


def test_plan_cache_unit_semantics():
    """Decorator semantics without Spark: hit/miss, LRU order, eviction
    callback, nested-value unpersist."""

    class Fake:
        def __init__(self) -> None:
            self.unpersisted = False

        def unpersist(self) -> None:
            self.unpersisted = True

    calls = []
    cache = PlanCache(maxsize=2)

    @cache
    def build(key):
        calls.append(key)
        return Fake()

    a, b = build("a"), build("b")
    assert build("a") is a  # hit, and "a" is now most-recent
    build("c")  # evicts "b"
    assert calls == ["a", "b", "c"]
    # Fake is not a DataFrame — _unpersist_value must not choke on it,
    # and tuples recurse (checked via the real DataFrame test above)
    assert build("a") is a
    assert len(cache) == 2
    cache.clear()
    assert len(cache) == 0
    assert build("a") is not a


def test_plan_cache_lru_model_property():
    """Property (hypothesis): against a reference LRU model, PlanCache
    returns the identical object on every hit, stays within maxsize, and
    releases exactly the model-evicted values in eviction order."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    import nomenklatura_spark.plans.cache as cache_mod

    @settings(max_examples=60, deadline=None)
    @given(keys=st.lists(st.sampled_from("abcdef"), min_size=1, max_size=50))
    def run(keys):
        released = []
        orig = cache_mod._unpersist_value
        cache_mod._unpersist_value = released.append
        try:
            cache = cache_mod.PlanCache(maxsize=3)

            @cache
            def build(k):
                return object()

            live: dict[str, object] = {}
            order: list[str] = []
            expected_released = []
            for k in keys:
                got = build(k)
                if k in live:
                    assert got is live[k], "hit must return the cached object"
                    order.remove(k)
                    order.append(k)
                else:
                    live[k] = got
                    order.append(k)
                    if len(order) > 3:
                        evicted = order.pop(0)
                        expected_released.append(live.pop(evicted))
                assert len(cache) == len(order) <= 3
            assert released == expected_released
            cache.clear()
            assert released == expected_released + list(live[k] for k in order)
        finally:
            cache_mod._unpersist_value = orig
            cache_mod._REGISTRY.pop()  # drop the throwaway cache instance

    run()

"""Persist-leak audit (VERDICT r14 #5): caller-owned persists must be
bounded — either released inside the operator (pagerank unpersists its
edge/node/routed caches) or deduplicated by Spark's CacheManager so that
REPEATED invocations of the same query never grow the cached-relation
set (the bench's blessed sharing model: identical plans re-persist into
the SAME InMemoryRelation entry, "Asked to cache already cached data").

Documented caller-owned persists that intentionally outlive their call
(one cache entry per distinct plan, session-lifetime, relied on by the
steady-pass sharing model and freed by session clearCache):

- plans/common.corpus — the shared tokenized corpus (one per sf_dir)
- ml/dedup._positional_grams     (duplicate_spans / excise share ONE
  entry: identical plan)
- ml/dedup.minhash_signatures    (the banded signature base)
- ml/bloom.bloom_contamination   (eval_grams)
- plans/textlm.collocations_lift_topk (nab, uni)
- plans/textlm.heaps_vocab_growth     (ranked, bounds)
- ml/selection.importance_weights     (toks, bstats)
- operators/ranking.distributed_rank  (the ranked relation)

The audit: run a sweep of every persist-owning headline query TWICE and
assert (a) the second sweep adds ZERO cache entries — no per-call
growth, the actual leak hazard for a long-lived session — and (b) the
one-time set stays within the documented bound above.
"""

from __future__ import annotations

SF_DIR = "/root/testdata/sf0.001"

QUERIES = [
    "collocations_lift_topk",
    "heaps_vocab_growth",
    "select_importance_dsir",
    "dedup_duplicate_spans",
    "dedup_excise_spans",
    "dedup_minhash_lsh",
    "decontaminate_bloom",
    "graph_pagerank_distributed",
]

# One entry per DISTINCT persisted plan reachable from the sweep: the
# shared corpus, the shared positional-gram relation, the minhash
# signature base, eval_grams, nab+uni, ranked+bounds, toks+bstats, plus
# small per-operator extras (dedup base relations).  The bound is
# deliberately a little loose — the invariant that matters is ZERO
# growth on re-run; the bound only catches a new unbounded persist
# pattern slipping in.
MAX_ONE_TIME_ENTRIES = 16


def _n_cached(spark) -> int:
    # SQL cache entries (one per distinct persisted PLAN) — the unit the
    # sharing model and this audit reason about.  RDD-level
    # getPersistentRDDs would also count the Pregel loops' transient
    # localCheckpoint blocks, which the ContextCleaner reclaims
    # asynchronously once their DataFrames are garbage-collected.
    return (
        spark._jsparkSession.sharedState().cacheManager().cachedData().size()
    )


def _run_all(spark, queries) -> None:
    for name in QUERIES:
        queries[name](spark, SF_DIR).write.format("noop").mode(
            "overwrite"
        ).save()


def test_registry_sweep_persists_are_bounded_and_idempotent(spark):
    from processo_etl_spark import plans
    from processo_etl_spark.plans import common

    queries = plans.all_queries()
    spark.catalog.clearCache()
    # clearCache drops the CacheManager entries; the corpus module memo
    # must drop with them or its (now-uncached) DataFrame would silently
    # recompute per consumer for the rest of the session.
    common._CORPUS_CACHE.clear()
    assert _n_cached(spark) == 0

    _run_all(spark, queries)
    first = _n_cached(spark)
    assert 0 < first <= MAX_ONE_TIME_ENTRIES, (
        f"one-time persist set {first} exceeds the documented bound "
        f"{MAX_ONE_TIME_ENTRIES} — a new caller-owned persist needs a "
        "docstring + an entry in this audit's allow-list"
    )

    _run_all(spark, queries)
    second = _n_cached(spark)
    assert second == first, (
        f"re-running the same queries grew the cache {first} -> {second}: "
        "a persisted plan is not deduplicating (per-call leak)"
    )

    spark.catalog.clearCache()
    common._CORPUS_CACHE.clear()
    assert _n_cached(spark) == 0

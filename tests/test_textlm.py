"""Hand-computed checks for the statistical-LM corpus analytics
(plans/textlm): Kneser-Ney continuation counts, lift collocations, and
the token-mass Gini — each against a tiny corpus whose statistics are
worked out by hand in the test body."""

from __future__ import annotations

import itertools

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from processo_etl_spark import plans

_CTR = itertools.count()


def _docs_dir(spark, tmp_path, rows):
    """Write a synthetic ``documents`` table and return its sf_dir."""
    df = spark.createDataFrame(
        rows, ["doc_id", "text", "lang", "source", "n_chars"]
    )
    df.coalesce(1).write.mode("overwrite").parquet(
        str(tmp_path / "documents.parquet")
    )
    return str(tmp_path)


def test_continuation_counts_hand_computed(spark, tmp_path):
    # normalized: d1 = "a b a b", d2 = "b c", d3 = "x" (no bigrams).
    # distinct bigrams: (a,b), (b,a), (b,c)  ->  T = 3
    # continuation (distinct left contexts): a<-{b}, b<-{a}, c<-{b} = 1 each
    # right contexts: a->{b} = 1, b->{a,c} = 2, c -> 0
    sf = _docs_dir(
        spark,
        tmp_path,
        [
            (1, "  A b   a B ", "en", "s1", 12),
            (2, "b c", "en", "s1", 3),
            (3, "x", "en", "s2", 1),
        ],
    )
    out = {
        r["word"]: r
        for r in plans.all_queries()["ngram_continuation_counts"](
            spark, sf
        ).collect()
    }
    assert set(out) == {"a", "b", "c"}
    for w, ctx in [("a", 1), ("b", 2), ("c", 0)]:
        assert out[w]["continuation_count"] == 1
        assert out[w]["context_count"] == ctx
        assert out[w]["continuation_prob"] == 1.0 / 3.0


def test_collocations_lift_hand_computed(spark, tmp_path):
    # d1 = "a b" x5 -> bigrams (a,b)=5, (b,a)=4; d2 = "c d" -> (c,d)=1
    # unigrams: a=5, b=5, c=1, d=1 -> T_uni = 12; T_bg = 10
    # only (a,b) survives n_ab >= 5:
    # lift = ((5*12)/5) * (12/5) / 10, bracketed exactly as the engine.
    sf = _docs_dir(
        spark,
        tmp_path,
        [(1, " ".join(["a b"] * 5), "en", "s1", 19), (2, "c d", "en", "s1", 3)],
    )
    rows = plans.all_queries()["collocations_lift_topk"](spark, sf).collect()
    assert len(rows) == 1
    r = rows[0]
    assert (r["w1"], r["w2"], r["n_ab"]) == ("a", "b", 5)
    assert r["lift"] == (5.0 * 12.0 / 5.0) * (12.0 / 5.0) / 10.0


def test_tokens_gini_hand_computed(spark, tmp_path):
    # token mass: s1 = 4 + 2 = 6, s2 = 1 -> sorted [1, 6], n=2, total=7
    # num = (2*1-3)*1 + (2*2-3)*6 = -1 + 6 = 5 ; gini = 5 / (2*7)
    sf = _docs_dir(
        spark,
        tmp_path,
        [
            (1, "a b a b", "en", "s1", 7),
            (2, "b c", "en", "s1", 3),
            (3, "x", "en", "s2", 1),
        ],
    )
    r = plans.all_queries()["tokens_gini_by_source"](spark, sf).collect()[0]
    assert r["n_sources"] == 2
    assert r["total_tokens"] == 7
    assert r["gini"] == 5.0 / 14.0


def test_heaps_vocab_growth_hand_computed(spark, tmp_path):
    # d1="a b", d2="b c", d3="c d a"; first occurrence: a,b->1 c->2 d->3
    # N=3 -> target ranks (3k+9)//10: deciles 1-3 -> doc 1, 4-6 -> doc 2,
    # 7-10 -> doc 3.  vocab at those boundaries: 2, 3, 4; tokens: 2, 4, 7.
    sf = _docs_dir(
        spark,
        tmp_path,
        [
            (1, "a b", "en", "s1", 3),
            (2, "b c", "en", "s1", 3),
            (3, "c d a", "en", "s1", 5),
        ],
    )
    rows = {
        r["decile"]: r
        for r in plans.all_queries()["heaps_vocab_growth"](spark, sf).collect()
    }
    assert set(rows) == set(range(1, 11))
    for k in range(1, 11):
        docs_seen = (3 * k + 9) // 10
        exp = {1: (2, 2), 2: (4, 3), 3: (7, 4)}[docs_seen]
        r = rows[k]
        assert (r["docs_seen"], r["tokens_seen"], r["vocab_size"]) == (
            docs_seen,
            *exp,
        )
        assert r["type_token_ratio"] == exp[1] / exp[0]


def test_cross_source_duplication_hand_computed(spark, tmp_path):
    # s1 = {dup, only-a}, s2 = {dup, only-b} (the second "dup" in s2
    # collapses in the DISTINCT (source, fp) projection).
    # diag: (s1,s1)=2, (s2,s2)=2; cross: (s1,s2) share 1, J = 1/(2+2-1).
    sf = _docs_dir(
        spark,
        tmp_path,
        [
            (1, "dup text", "en", "s1", 8),
            (2, "only a", "en", "s1", 6),
            (3, "Dup   TEXT", "en", "s2", 10),
            (4, "only b", "en", "s2", 6),
            (5, "dup text", "en", "s2", 8),
        ],
    )
    rows = {
        (r["src_a"], r["src_b"]): r
        for r in plans.all_queries()["cross_source_duplication"](
            spark, sf
        ).collect()
    }
    assert set(rows) == {("s1", "s1"), ("s1", "s2"), ("s2", "s2")}
    for key, shared, jac in [
        (("s1", "s1"), 2, 1.0),
        (("s1", "s2"), 1, 1.0 / 3.0),
        (("s2", "s2"), 2, 1.0),
    ]:
        r = rows[key]
        assert r["shared_fingerprints"] == shared
        assert (r["fp_a"], r["fp_b"]) == (2, 2)
        assert r["jaccard"] == jac


def test_cluster_size_histogram_hand_computed(spark, tmp_path):
    # Planted duplicate groups: one triple (docs 1-3), one pair (4-5),
    # two singletons (no cluster rows) -> histogram {3: 1 cluster, 2: 1}.
    tri = "alpha beta gamma delta epsilon zeta eta theta"
    duo = "one two three four five six seven eight nine"
    sf = _docs_dir(
        spark,
        tmp_path,
        [
            (1, tri, "en", "s1", len(tri)),
            (2, tri, "en", "s1", len(tri)),
            (3, tri, "en", "s2", len(tri)),
            (4, duo, "en", "s1", len(duo)),
            (5, duo, "en", "s2", len(duo)),
            (6, "lonely text about nothing shared here", "en", "s1", 37),
            (7, "completely different words appear within", "en", "s2", 40),
        ],
    )
    rows = {
        r["cluster_size"]: r
        for r in plans.all_queries()["dedup_cluster_size_histogram"](
            spark, sf
        ).collect()
    }
    assert set(rows) == {2, 3}
    assert (rows[2]["n_clusters"], rows[2]["n_docs"]) == (1, 2)
    assert (rows[3]["n_clusters"], rows[3]["n_docs"]) == (1, 3)


def test_ngram_diversity_hand_computed(spark, tmp_path):
    # s1 = "a b a b": uni 4/2, bi ("a b","b a","a b") 3/2, tri 2/2
    # s2 = "x": uni 1/1 only (too short for bi/tri)
    sf = _docs_dir(
        spark,
        tmp_path,
        [(1, "a b a b", "en", "s1", 7), (2, "x", "en", "s2", 1)],
    )
    rows = {
        (r["source"], r["n"]): r
        for r in plans.all_queries()["ngram_diversity_by_source"](
            spark, sf
        ).collect()
    }
    assert set(rows) == {("s1", 1), ("s1", 2), ("s1", 3), ("s2", 1)}
    for key, tot, dis in [
        (("s1", 1), 4, 2),
        (("s1", 2), 3, 2),
        (("s1", 3), 2, 2),
        (("s2", 1), 1, 1),
    ]:
        r = rows[key]
        assert (r["total_ngrams"], r["distinct_ngrams"]) == (tot, dis)
        assert r["diversity"] == dis / tot


# --- property-based: the textlm statistics match a pure-Python reference
# on arbitrary small-vocab corpora (one parquet write + one job per
# hypothesis example, so examples are few and corpora small).

_VOCAB = ["alpha", "beta", "gamma", "delta", "eps"]
DOCS = st.lists(
    st.tuples(
        st.lists(st.sampled_from(_VOCAB), max_size=10),
        st.sampled_from(["s1", "s2", "s3"]),
    ),
    min_size=1,
    max_size=10,
)


def _fresh_dir(spark, tmp_path, docs):
    rows = [
        (i + 1, " ".join(words), "en", src, len(" ".join(words)))
        for i, (words, src) in enumerate(docs)
    ]
    return _docs_dir(spark, tmp_path / f"c{next(_CTR)}", rows)


@settings(
    max_examples=5,
    deadline=None,
    # tmp_path is deliberately shared across examples: _fresh_dir gives
    # each example its own subdirectory (and corpus() cache key).
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(DOCS)
def test_continuation_matches_python_reference(spark, tmp_path, docs):
    bg = set()
    for words, _ in docs:
        bg.update(zip(words, words[1:]))
    cont: dict = {}
    ctx: dict = {}
    for w1, w2 in bg:
        cont[w2] = cont.get(w2, 0) + 1
        ctx[w1] = ctx.get(w1, 0) + 1
    sf = _fresh_dir(spark, tmp_path, docs)
    rows = plans.all_queries()["ngram_continuation_counts"](
        spark, sf
    ).collect()
    assert len(rows) == len(cont)
    for r in rows:
        w = r["word"]
        assert r["continuation_count"] == cont[w]
        assert r["context_count"] == ctx.get(w, 0)
        assert r["continuation_prob"] == cont[w] / len(bg)


@settings(
    max_examples=5,
    deadline=None,
    # tmp_path is deliberately shared across examples: _fresh_dir gives
    # each example its own subdirectory (and corpus() cache key).
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(DOCS)
def test_gini_matches_python_reference(spark, tmp_path, docs):
    per_src: dict = {}
    for words, src in docs:
        norm = " ".join(" ".join(words).split())
        per_src[src] = per_src.get(src, 0) + len(norm.split(" "))
    xs = sorted(per_src.values())
    n, total = len(xs), sum(xs)
    num = sum((2 * (i + 1) - n - 1) * x for i, x in enumerate(xs))
    sf = _fresh_dir(spark, tmp_path, docs)
    r = plans.all_queries()["tokens_gini_by_source"](spark, sf).collect()[0]
    assert (r["n_sources"], r["total_tokens"]) == (n, total)
    assert r["gini"] == num / (n * total)
    assert 0.0 <= r["gini"] < 1.0


@settings(
    max_examples=5,
    deadline=None,
    # tmp_path is deliberately shared across examples: _fresh_dir gives
    # each example its own subdirectory (and corpus() cache key).
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(DOCS)
def test_diversity_matches_python_reference(spark, tmp_path, docs):
    ref: dict = {}
    for words, src in docs:
        if not words:
            continue
        for n in (1, 2, 3):
            if len(words) < n:
                continue
            key = (src, n)
            tot, dis = ref.get(key, (0, set()))
            grams = [
                " ".join(words[i : i + n])
                for i in range(len(words) - n + 1)
            ]
            ref[key] = (tot + len(grams), dis | set(grams))
    sf = _fresh_dir(spark, tmp_path, docs)
    rows = plans.all_queries()["ngram_diversity_by_source"](
        spark, sf
    ).collect()
    assert len(rows) == len(ref)
    for r in rows:
        tot, dis = ref[(r["source"], r["n"])]
        assert (r["total_ngrams"], r["distinct_ngrams"]) == (tot, len(dis))
        assert r["diversity"] == len(dis) / tot


def test_gini_equal_sources_is_zero(spark, tmp_path):
    sf = _docs_dir(
        spark,
        tmp_path,
        [(1, "a b c", "en", "s1", 5), (2, "d e f", "en", "s2", 5)],
    )
    r = plans.all_queries()["tokens_gini_by_source"](spark, sf).collect()[0]
    assert r["gini"] == 0.0

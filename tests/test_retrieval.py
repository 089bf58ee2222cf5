"""Hybrid retrieval: RRF fusion semantics and kNN label voting."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from processo_etl_spark.ml import fusion


def test_rrf_fuse_scores_and_outer_semantics(spark):
    """Items seen by one ranker contribute only that addend; items in
    both sum both; k0 enters the denominator with the 1-based rank."""
    a = spark.createDataFrame([(1, 1), (2, 2), (3, 3)], "doc long, rank int")
    b = spark.createDataFrame([(2, 1), (4, 2)], "doc long, rank int")
    out = {
        r["doc"]: (r["rank_a"], r["rank_b"], r["rrf_score"])
        for r in fusion.rrf_fuse({"a": a, "b": b}, k0=60).collect()
    }
    assert set(out) == {1, 2, 3, 4}
    assert out[1] == (1, None, round(1 / 61, 10))
    assert out[2] == (2, 1, round(1 / 62 + 1 / 61, 10))
    assert out[3] == (3, None, round(1 / 63, 10))
    assert out[4] == (None, 2, round(1 / 62, 10))


def test_rrf_fuse_rejects_empty():
    with pytest.raises(ValueError):
        fusion.rrf_fuse({})


def test_rrf_fuse_single_ranker_is_identity_order(spark):
    a = spark.createDataFrame([(7, 1), (9, 2)], "doc long, rank int")
    rows = (
        fusion.rrf_fuse({"only": a}, k0=0)
        .orderBy(F.desc("rrf_score"))
        .collect()
    )
    assert [r["doc"] for r in rows] == [7, 9]
    assert rows[0]["rrf_score"] == 1.0
    assert rows[1]["rrf_score"] == 0.5


def test_hybrid_rrf_contains_both_rankers(spark):
    """At sf0.001 the fused top-10 must carry at least one doc ranked by
    each side (rank_lex / rank_dense non-null somewhere), and the fused
    order must be (rrf desc, doc asc)."""
    from processo_etl_spark.plans.retrieval import retrieval_hybrid_rrf

    rows = retrieval_hybrid_rrf(spark, "/root/testdata/sf0.001").collect()
    assert len(rows) == 10
    assert any(r["rank_dense"] is not None for r in rows)
    assert any(r["rank_lex"] is not None for r in rows)
    key = [(-r["rrf_score"], r["doc"]) for r in rows]
    assert key == sorted(key)


def test_knn_label_vote_majority_and_tiebreak(spark):
    """2-of-3 majority wins; a 1-1-1 split (k=3, three labels) breaks to
    the smallest label.  Probe vectors point near distinct corpus axes
    so the neighbor sets are unambiguous."""
    from processo_etl_spark.ml import similarity

    # corpus: two tight clusters on axes 0 and 1 with labels 10 / 20
    rows = [
        (100, [1.0, 0.05, 0.0], 10),
        (101, [1.0, -0.05, 0.0], 10),
        (102, [0.05, 1.0, 0.0], 20),
        (103, [-0.05, 1.0, 0.0], 20),
        (0, [0.9, 0.4, 0.0], 99),  # probe: nearer axis 0
    ]
    emb = spark.createDataFrame(
        rows, "vec_id long, embedding array<double>, label int"
    )
    nb = similarity.brute_force_topk(emb, emb.filter("vec_id = 0"), k=3)
    labels = emb.select(F.col("vec_id").alias("neighbor_id"), "label")
    votes = (
        labels.join(nb, "neighbor_id")
        .groupBy("query_id", "label")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy(F.desc("n"), F.asc("label"))
        .collect()
    )
    # top-3 neighbors of the probe: both axis-0 docs (label 10) + one
    # axis-1 doc → majority 10
    assert votes[0]["label"] == 10 and votes[0]["n"] == 2


def test_knn_label_vote_registry_shape(spark):
    from processo_etl_spark.plans.retrieval import knn_label_vote

    rows = knn_label_vote(spark, "/root/testdata/sf0.001").collect()
    assert len(rows) == 8  # one prediction per probe vec_id < 8
    assert sorted(r["query_id"] for r in rows) == list(range(8))
    assert all(r["n_votes"] >= 1 for r in rows)

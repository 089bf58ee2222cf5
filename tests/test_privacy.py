"""Privacy-audit operator tests (quality/privacy.py)."""

from __future__ import annotations

from processo_etl_spark.quality import privacy


def _qi_df(spark):
    # QI = (region, band).  Groups: ('n', 0) size 1 — unique row;
    # ('s', 0) size 3, segments {a, b}; ('s', 1) size 5, segment {a}.
    rows = [
        (1, "n", 0, "a"),
        (2, "s", 0, "a"),
        (3, "s", 0, "a"),
        (4, "s", 0, "b"),
        (5, "s", 1, "a"),
        (6, "s", 1, "a"),
        (7, "s", 1, "a"),
        (8, "s", 1, "a"),
        (9, "s", 1, "a"),
    ]
    return spark.createDataFrame(rows, ["id", "region", "band", "seg"])


def test_k_anonymity_histogram_hand_computed(spark):
    got = {
        r["k_bucket"]: (r["n_groups"], r["n_rows"])
        for r in privacy.k_anonymity_histogram(
            _qi_df(spark), ["region", "band"]
        ).collect()
    }
    assert got == {"1": (1, 1), "2-4": (1, 3), "5-9": (1, 5)}


def test_l_diversity_histogram_flags_homogeneous_groups(spark):
    got = {
        r["l_distinct"]: (r["n_groups"], r["n_rows"])
        for r in privacy.l_diversity_histogram(
            _qi_df(spark), ["region", "band"], "seg"
        ).collect()
    }
    # ('n',0) and ('s',1) are homogeneous (l=1); ('s',0) carries {a,b}.
    assert got == {1: (2, 6), 2: (1, 3)}


def test_suppress_small_groups_nulls_qi_only_below_k(spark):
    out = privacy.suppress_small_groups(
        _qi_df(spark), ["region", "band"], k=4
    ).collect()
    by_id = {r["id"]: r for r in out}
    assert len(by_id) == 9
    # groups of size 1 and 3 are suppressed; size-5 group survives
    for i in (1, 2, 3, 4):
        r = by_id[i]
        assert r["suppressed"] is True
        assert r["region"] is None and r["band"] is None
        assert r["seg"] is not None  # non-QI columns pass through
    for i in (5, 6, 7, 8, 9):
        r = by_id[i]
        assert r["suppressed"] is False
        assert r["region"] == "s" and r["band"] == 1

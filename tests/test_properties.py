"""Property-based tests (hypothesis): arbitrary text never breaks the
text operators, and their structural invariants hold.

Spark jobs are expensive per example, so each property draws a BATCH of
strings and runs one job over the whole batch."""

from __future__ import annotations

from hypothesis import given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from processo_etl_spark.functions import text as ftext
from processo_etl_spark.ml import dedup

# Printable-ish text incl. accents, semicolons, slashes, whitespace runs.
TEXTS = st.lists(
    st.text(
        alphabet=st.characters(
            whitelist_categories=("L", "N", "P", "Zs"), max_codepoint=0x2FF
        ),
        max_size=80,
    ),
    min_size=1,
    max_size=50,
)


@settings(max_examples=5, deadline=None)
@given(TEXTS)
def test_shingles_never_crash_and_count_correct(spark, texts):
    df = spark.createDataFrame([(i, t) for i, t in enumerate(texts)], "id long, text string")
    out = df.select(
        "id",
        F.size(F.split(dedup.normalize_text("text"), " ")).alias("n_tok"),
        F.size(dedup.word_shingles("text", 3)).alias("n_sh"),
    ).collect()
    for r in out:
        # |shingles| == max(n_tokens - 2, 1) by construction.
        assert r["n_sh"] == max(r["n_tok"] - 2, 1)


@settings(max_examples=5, deadline=None)
@given(TEXTS)
def test_minhash_in_range_and_permutation_independent_of_order(spark, texts):
    df = spark.createDataFrame([(i, t) for i, t in enumerate(texts)], "id long, text string")
    sig = df.select(
        "id",
        dedup.minhash_signature(
            F.array_distinct(dedup.word_shingles("text", 3)), k=4
        ).alias("sig"),
        dedup.minhash_signature(
            F.reverse(F.array_distinct(dedup.word_shingles("text", 3))), k=4
        ).alias("sig_rev"),
    ).collect()
    for r in sig:
        assert all(0 <= v <= dedup.MERSENNE_P for v in r["sig"])
        # min over a set is order-invariant.
        assert r["sig"] == r["sig_rev"]


@settings(max_examples=5, deadline=None)
@given(st.lists(st.text(max_size=30), min_size=1, max_size=30))
def test_multilabel_flags_never_crash(spark, labels_text):
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(labels_text)], "id long, tracado_via string"
    )
    out = ftext.multilabel_flags(df, "tracado_via")
    rows = out.collect()
    assert len(rows) == len(labels_text)
    # Flags are booleans (never null) for non-null inputs.
    for r in rows:
        for label in ftext.TRACADO_LABELS:
            assert r[label] in (True, False)

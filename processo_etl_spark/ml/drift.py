"""Distribution-drift auditing between corpus slices.

The data-ops guard for a training pipeline: did today's ingest (or a
new source) change the token distribution versus the reference corpus?
Standard monitors use PSI or KL — both need ``ln``, whose last-ULP
varies across libm implementations and would break oracle bit-parity.
Pearson's chi-square statistic over hashed token buckets is the
transcendental-free equivalent: rational arithmetic on exact counts,
engine-portable to the bit.

Determinism discipline (same as ml/selection's DSIR fold):

- counts are exact longs (< 2^53, so their double images are exact);
- each bucket's term ``(o−e)²/e`` is a fixed short sequence of IEEE
  double ops — bit-identical on any engine;
- the sum over buckets is a LEFT FOLD over the VALUE-SORTED term list
  (a plain double SUM is partition-order dependent in its last ULP).

Scale shape: one token explode + one groupBy on the FIXED B-bucket
grid (map-side combinable, skew-proof — same argument as the Count-Min
build), totals derived from the B-row cell table, one final 1-row
fold.  Nothing scales with vocabulary or corpus beyond the single
token pass.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from processo_etl_spark.ml.dedup import md5_long, normalize_text


def chi2_token_drift(
    df: DataFrame,
    text_col: str,
    is_reference: Column,
    n_buckets: int = 256,
) -> DataFrame:
    """One row: (n_ref, n_cand, n_buckets_hit, chi2, drift_detected).

    2×B contingency table of hashed-token counts, reference slice vs
    candidate slice; ``chi2`` is Pearson's statistic, ``drift_detected``
    compares it to the χ²(df≈B−1) upper 1% critical value — under the
    null (same distribution) the statistic concentrates near B−1.
    """
    b = n_buckets
    toks = df.select(
        is_reference.alias("is_ref"),
        F.explode(F.split(normalize_text(text_col), " ")).alias("tok"),
    ).withColumn("b", md5_long(F.col("tok")) % b)
    cells = toks.groupBy("b").agg(
        F.count(F.when(F.col("is_ref"), 1)).alias("ca"),
        F.count(F.when(~F.col("is_ref"), 1)).alias("cb"),
    )
    totals = cells.agg(
        F.sum("ca").alias("na"), F.sum("cb").alias("nb")
    )
    d = lambda c: F.col(c).cast("double")  # noqa: E731
    n = d("na") + d("nb")
    rb = d("ca") + d("cb")
    ea = d("na") * rb / n
    eb = d("nb") * rb / n
    term = (d("ca") - ea) * (d("ca") - ea) / ea + (d("cb") - eb) * (
        d("cb") - eb
    ) / eb
    terms = cells.crossJoin(F.broadcast(totals)).select(
        "na", "nb", term.alias("t")
    )
    fold = F.aggregate(
        F.sort_array(F.collect_list("t")),
        F.lit(0.0).cast("double"),
        lambda acc, x: acc + x,
    )
    agg = terms.groupBy("na", "nb").agg(
        F.count(F.lit(1)).alias("n_buckets_hit"), fold.alias("chi2")
    )
    # χ² upper 1% critical value at df = buckets−1 via Wilson–Hilferty:
    # df·(1 − 2/(9df) + z·√(2/(9df)))³, z₀.₉₉ = 2.326348.  Only sqrt and
    # arithmetic — every op correctly rounded IEEE, so the oracle
    # replays the verdict bit-for-bit (no ln / inverse-CDF needed).
    dfd = (F.col("n_buckets_hit") - 1).cast("double")
    inner = (
        F.lit(1.0) - F.lit(2.0) / (F.lit(9.0) * dfd)
        + F.lit(2.326348) * F.sqrt(F.lit(2.0) / (F.lit(9.0) * dfd))
    )
    crit = dfd * inner * inner * inner
    # The statistic is emitted ROUND(·, 6): the r7 driver proved that a
    # 512-term double fold — even value-sorted — can differ at the ULP
    # between DuckDB builds, so the raw fold stays internal and the
    # output follows the repo's ROUND-portability convention (same rule
    # as the OLS/corr family, plans/aggregates.py).  The verdict compares
    # the RAW statistic to the critical value: the planted-shift test
    # keeps χ² decades away from the threshold, so a last-ULP difference
    # cannot flip the boolean.
    return agg.select(
        F.col("na").alias("n_ref"),
        F.col("nb").alias("n_cand"),
        "n_buckets_hit",
        F.round(F.col("chi2"), 6).alias("chi2"),
        (F.col("chi2") > crit).alias("drift_detected"),
    )

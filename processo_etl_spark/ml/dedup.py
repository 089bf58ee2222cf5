"""Document deduplication at scale: exact, MinHash+LSH, SimHash, n-gram
Jaccard.

Design for 100 TB:

- Exact dedup = hash → groupBy(hash) — one shuffle on a 128-bit key,
  map-side combinable.
- Near-dup never compares all pairs: MinHash signatures are computed
  per-row (narrow), LSH banding turns similarity search into an
  equi-join on (band_index, band_hash) — Spark's bread-and-butter
  shuffle join — and only bucket-mates are verified with exact Jaccard.
- All hashes are md5-prefix integers (deterministic, engine-portable,
  no JVM-specific murmur seeds) so results are reproducible anywhere
  and oracle-comparable.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def md5_long(c: Column) -> Column:
    """Deterministic 60-bit integer hash: first 15 hex chars of md5."""
    return F.conv(F.substring(F.md5(c), 1, 15), 16, 10).cast("long")


def normalize_text(c: Column | str) -> Column:
    """Canonical form for fingerprinting: lowercase, collapsed whitespace."""
    col = F.col(c) if isinstance(c, str) else c
    return F.lower(F.regexp_replace(F.trim(col), r"\s+", " "))


def fingerprint(c: Column | str) -> Column:
    """128-bit content fingerprint of normalized text (hex string)."""
    return F.md5(normalize_text(c))


def exact_dedup(
    df: DataFrame, text_col: str, id_col: str
) -> DataFrame:
    """Exact dedup: keep the min-id row per content fingerprint.

    One shuffle on the fingerprint; survivors + duplicate counts.
    """
    return (
        df.withColumn("fp", fingerprint(text_col))
        .groupBy("fp")
        .agg(
            F.min(id_col).alias(id_col),
            F.count(F.lit(1)).alias("n_copies"),
        )
    )


def word_shingles(text_col: Column | str, n: int = 3) -> Column:
    """Word n-gram shingles as an array<string> — pure array expressions.

    tokens[i..i+n-1] for i in 1..len-n+1; rows shorter than n yield the
    whole text as a single shingle so they still participate.
    """
    col = F.col(text_col) if isinstance(text_col, str) else text_col
    toks = F.split(normalize_text(col), " ")
    idx = F.sequence(F.lit(1), F.greatest(F.size(toks) - (n - 1), F.lit(1)))
    return F.transform(
        idx,
        lambda i: F.concat_ws(
            " ", *[F.element_at(toks, i + j) for j in range(n)]
        ),
    )


def _seeded_hash(seed: int):
    """Single-arg HOF lambda factory.

    NOTE: PySpark higher-order functions pass the element *index* as a
    second argument to two-parameter lambdas — a ``lambda s, i=i:``
    closure would silently receive the index Column.  Factories keep the
    lambdas unary.
    """
    return lambda s: md5_long(F.concat(F.lit(f"{seed}|"), s))


def minhash_signature(shingles: Column, k: int = 16) -> Column:
    """k independent min-hashes: min over shingles of md5_long(seed|shingle).

    Computed per-row (narrow, no shuffle); k seeded hash families via
    string seed prefixes — deterministic and portable.
    """
    return F.array(
        *[
            F.array_min(F.transform(shingles, _seeded_hash(i))).alias(f"mh{i}")
            for i in range(k)
        ]
    )


def _band_hash(sig: Column, band: int, rows_per_band: int) -> Column:
    start = band * rows_per_band + 1  # slice is 1-based
    return F.md5(
        F.concat_ws(",", *[
            F.element_at(sig, start + j).cast("string") for j in range(rows_per_band)
        ])
    )


def minhash_lsh_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    k: int = 16,
    bands: int = 4,
    shingle_n: int = 3,
    threshold: float = 0.5,
) -> DataFrame:
    """Near-duplicate pairs via MinHash + LSH banding + exact verify.

    1. signature: k minhashes per doc (narrow map).
    2. banding: b bands of k/b rows; docs sharing any band hash are
       candidates — an equi-join on (band, band_hash), never all-pairs.
    3. verify: exact Jaccard over distinct shingle sets ≥ threshold.

    Returns (id_a, id_b, jaccard) with id_a < id_b.
    """
    rows_per_band = k // bands
    base = df.select(
        F.col(id_col).alias("doc"),
        F.array_distinct(word_shingles(text_col, shingle_n)).alias("sh"),
    ).withColumn("sig", minhash_signature(F.col("sh"), k))

    banded = base.select(
        "doc",
        "sh",
        F.explode(
            F.array(*[
                F.struct(
                    F.lit(b).alias("band"),
                    _band_hash(F.col("sig"), b, rows_per_band).alias("bh"),
                )
                for b in range(bands)
            ])
        ).alias("lsh"),
    ).select("doc", "sh", "lsh.band", "lsh.bh")

    left = banded.select(
        F.col("doc").alias("id_a"), F.col("sh").alias("sh_a"), "band", "bh"
    )
    right = banded.select(
        F.col("doc").alias("id_b"), F.col("sh").alias("sh_b"), "band", "bh"
    )
    cand = (
        left.join(right, on=["band", "bh"])
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b", "sh_a", "sh_b")
        .dropDuplicates(["id_a", "id_b"])
    )
    inter = F.size(F.array_intersect("sh_a", "sh_b"))
    union = F.size("sh_a") + F.size("sh_b") - inter
    jac = inter.cast("double") / union.cast("double")
    return (
        cand.withColumn("jaccard", jac)
        .filter(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", "jaccard")
    )


def ngram_jaccard_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    block_col: str,
    shingle_n: int = 3,
    threshold: float = 0.3,
) -> DataFrame:
    """Blocked exact n-gram Jaccard: all pairs *within a blocking key*.

    The block join keeps the candidate set linear-ish (never global
    all-pairs); use MinHash-LSH when no natural blocking key exists.
    """
    base = df.select(
        F.col(block_col).alias("blk"),
        F.col(id_col).alias("doc"),
        F.array_distinct(word_shingles(text_col, shingle_n)).alias("sh"),
    )
    a = base.select("blk", F.col("doc").alias("id_a"), F.col("sh").alias("sh_a"))
    b = base.select("blk", F.col("doc").alias("id_b"), F.col("sh").alias("sh_b"))
    pairs = a.join(b, on="blk").filter(F.col("id_a") < F.col("id_b"))
    inter = F.size(F.array_intersect("sh_a", "sh_b"))
    union = F.size("sh_a") + F.size("sh_b") - inter
    jac = inter.cast("double") / union.cast("double")
    return (
        pairs.withColumn("jaccard", jac)
        .filter(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", "jaccard")
    )


def simhash64(tokens: Column) -> Column:
    """64-bit SimHash of a token array — pure expressions, no UDF.

    For each bit i: sum over tokens of (+1 if bit set in md5_long(token)
    else -1); bit i of the result = (sum > 0).  Near-dups have small
    Hamming distance between signatures.

    Note: md5_long yields 60 bits (15 hex chars), so bits 60-63 are
    always 'unset' votes; with 60 informative bits the signature keeps
    its locality properties (documented deviation from a full 64).
    """
    th = F.transform(tokens, md5_long)

    def _vote(bit: int):
        mask = F.lit(1 << bit)
        return lambda a, h: a + F.when(h.bitwiseAND(mask) != 0, 1).otherwise(-1)

    acc = F.lit(0).cast("long")
    for i in range(60):
        votes = F.aggregate(th, F.lit(0), _vote(i))
        acc = acc + F.when(votes > 0, F.lit(1 << i)).otherwise(0)
    return acc


def hamming64(a: Column, b: Column) -> Column:
    """Hamming distance between two 64-bit signatures (bit_count of xor)."""
    return F.bit_count(a.bitwiseXOR(b))


def simhash_dedup_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    max_hamming: int = 8,
    prefix_bits: int = 12,
) -> DataFrame:
    """SimHash near-dup pairs, blocked by the top signature bits.

    Blocking on the high ``prefix_bits`` keeps the join linear; a full
    production rollout would use 4 rotated prefix tables (pigeonhole on
    max_hamming) — one table suffices for the demo and tests.
    """
    base = df.select(
        F.col(id_col).alias("doc"),
        simhash64(F.split(normalize_text(text_col), " ")).alias("sig"),
    ).withColumn("blk", F.shiftright("sig", 60 - prefix_bits))
    a = base.select(F.col("doc").alias("id_a"), F.col("sig").alias("sig_a"), "blk")
    b = base.select(F.col("doc").alias("id_b"), F.col("sig").alias("sig_b"), "blk")
    return (
        a.join(b, on="blk")
        .filter(F.col("id_a") < F.col("id_b"))
        .withColumn("hamming", hamming64(F.col("sig_a"), F.col("sig_b")))
        .filter(F.col("hamming") <= max_hamming)
        .select("id_a", "id_b", "hamming")
    )

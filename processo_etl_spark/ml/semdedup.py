"""SemDeDup: semantic deduplication over embedding clusters.

Abbas et al. 2023 ("SemDeDup: Data-efficient learning at web-scale
through semantic deduplication", arXiv:2303.09540): cluster document
embeddings with k-means, then inside each cluster drop all but one of
any set of examples whose pairwise cosine similarity exceeds a
threshold — catching *semantic* duplicates (paraphrases, boilerplate
variants, templated pages) that lexical MinHash/SimHash miss.

Spark-first shape (same scaling argument as the LSH dedup family):

- cluster assignment is a **map-side column** — no shuffle;
- the within-cluster pairwise check is a **cell-blocked equi-self-join**
  — never all-pairs; cost is Σ |cell|², bounded by raising the cluster
  count with corpus size (the paper uses 50k clusters at web scale,
  keeping cells ~constant-size);
- the survivor set is one **left-anti join** against the dropped ids.

Two interchangeable quantizers:

- ``semantic_dedup_kmeans`` — the paper's: MLlib k-means trained on a
  bounded sample (``similarity.train_ivf_centroids``), assignment via
  native expressions.  Iterative training is not SQL-expressible, so
  the registry grades this variant rows-only.
- ``semantic_dedup_cells`` — deterministic sign-LSH cells
  (``similarity.sign_bucket``), fully replayable in ANSI SQL: the
  DuckDB oracle reproduces it bit-for-bit (plans/mlops.py).  Slightly
  lower recall than data-adaptive k-means cells at equal cell count;
  same complexity bound.

Keep policy: **deterministic keep-lowest-id** — row ``j`` is dropped
iff some ``i < j`` in the same cell has ``cos(i, j) ≥ threshold``.
The paper keeps a random (or centroid-farthest) member per duplicate
group; lowest-id is order-insensitive across partitions and engines,
which the differential oracle requires.  The policy only affects WHICH
representative survives, not how many near-duplicate groups collapse.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from processo_etl_spark.ml import similarity


def _prune_cells(
    assigned: DataFrame, id_col: str, threshold: float
) -> DataFrame:
    """Shared prune: ``assigned`` carries (id, v, cell); returns the
    survivors (id, cell) under the keep-lowest-id policy.

    The dropped set is built from the blocked pair join directly —
    ``id_b`` of any qualifying pair is dropped; a row with no
    smaller-id near-twin in its cell survives.  One equi-join on cell
    plus one distinct and one anti-join; no connected components needed
    (the rule is a NOT EXISTS, not a grouping).

    Norms are precomputed per ROW before the self-join, so each of the
    O(Σ|cell|²) pairs evaluates one dot product and a scalar
    multiply/divide instead of three array folds — same sqrt/mul/div
    tree as ``similarity.cosine`` (and the SQL oracle), so the doubles
    are bit-identical.
    """
    normed = assigned.withColumn("nrm", similarity.l2_norm(F.col("v")))
    a = normed.select(
        F.col(id_col).alias("id_a"),
        F.col("v").alias("va"),
        F.col("nrm").alias("na"),
        "cell",
    )
    b = normed.select(
        F.col(id_col).alias("id_b"),
        F.col("v").alias("vb"),
        F.col("nrm").alias("nb"),
        "cell",
    )
    dropped = (
        a.join(b, on="cell")
        .filter(F.col("id_a") < F.col("id_b"))
        .filter(
            similarity.dot(F.col("va"), F.col("vb"))
            / (F.col("na") * F.col("nb"))
            >= F.lit(threshold)
        )
        .select(F.col("id_b").alias(id_col))
        .distinct()
    )
    return assigned.join(dropped, on=id_col, how="left_anti").select(
        id_col, "cell"
    )


def semantic_dedup_cells(
    df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    threshold: float = 0.85,
    bits: int = 6,
) -> DataFrame:
    """SemDeDup with deterministic sign-LSH cells (oracle-replayable).

    Returns the surviving (id, cell) rows: one representative (the
    lowest id) per near-duplicate group within each cell.
    """
    assigned = df.select(
        F.col(id_col),
        F.col(vec_col).alias("v"),
        similarity.sign_bucket(F.col(vec_col), bits).alias("cell"),
    )
    return _prune_cells(assigned, id_col, threshold)


def semantic_dedup_kmeans(
    df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    threshold: float = 0.85,
    nlist: int = 8,
    seed: int = 42,
    max_sample: int = 100_000,
) -> DataFrame:
    """SemDeDup with k-means cells (the paper's quantizer).

    Training cost is decoupled from corpus size (bounded sample); the
    assignment pass and the cell-blocked prune scan the corpus once
    each.  At 100 TB: persist the assignment (it is also the IVF index
    cell — one clustering serves both dedup and ANN search) and scale
    ``nlist`` with the corpus so cells stay bounded.
    """
    centers = similarity.train_ivf_centroids(
        df, nlist=nlist, vec_col=vec_col, seed=seed, max_sample=max_sample
    )
    assigned = similarity.ivf_assign(df, centers, vec_col).select(
        F.col(id_col), F.col(vec_col).alias("v"), "cell"
    )
    return _prune_cells(assigned, id_col, threshold)

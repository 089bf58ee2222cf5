"""Rank fusion for hybrid retrieval (extension surface, like
ml/invindex.py / ml/similarity.py — no reference counterpart: the
reference's scope ends at relational EDA, while a training-data /
RAG pipeline retrieves with BOTH a lexical ranker (BM25) and a dense
ranker (embedding cosine) and fuses their rankings).

Reciprocal-rank fusion (Cormack, Clarke & Buettcher, SIGIR 2009):

    rrf(d) = Σ_r 1 / (k0 + rank_r(d))        over rankers r seeing d

RRF is the standard fusion baseline because it needs no score
calibration — only ranks enter, so a BM25 log-scale score and a
[-1, 1] cosine fuse without normalization, and it is famously hard
to beat with learned weights.

Oracle-parity design: ranks are exact small integers, each addend
``1/(k0 + rank)`` is ONE IEEE division, and the fused sum adds a
fixed, tiny number of addends in deterministic column order — no
order-dependent accumulation, so the DuckDB twin matches bit-for-bit
(rounded at 10 decimals per the module-wide ROUND-portability rule).

Scale shape: inputs are per-query top-k lists (|queries|·k rows, k
constant), never corpus-scale — the corpus work happens inside the
rankers, which are already bucketed (inverted-index posting reads,
LSH/IVF candidate pruning).  Fusion itself is a full-outer equi-join
of k-row relations per query: negligible at any corpus size.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def rrf_fuse(
    ranked: dict[str, DataFrame],
    id_col: str = "doc",
    rank_col: str = "rank",
    k0: int = 60,
) -> DataFrame:
    """Fuse named ranked lists by reciprocal-rank fusion.

    ``ranked`` maps a ranker name to its top-k DataFrame carrying
    ``id_col`` and an integer ``rank_col`` (1-based, deterministic
    tiebreaks upstream).  Returns one row per item seen by ANY ranker:
    ``(id_col, rank_<name>... , rrf_score)`` with NULL rank where a
    ranker did not surface the item (its addend contributes 0).
    ``k0 = 60`` is the paper's constant.

    Join order and addend order follow the dict's insertion order, so
    the fused double is reproducible run-to-run and engine-to-engine.
    """
    if not ranked:
        raise ValueError("rrf_fuse needs at least one ranked list")
    fused: DataFrame | None = None
    names = list(ranked)
    for name in names:
        side = ranked[name].select(
            F.col(id_col), F.col(rank_col).cast("int").alias(f"rank_{name}")
        )
        fused = side if fused is None else fused.join(side, id_col, "full_outer")
    score = None
    for name in names:
        addend = F.coalesce(
            F.lit(1.0) / (F.lit(float(k0)) + F.col(f"rank_{name}")),
            F.lit(0.0),
        )
        score = addend if score is None else score + addend
    return fused.withColumn("rrf_score", F.round(score, 10))

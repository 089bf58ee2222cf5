"""Graph analytics over aggregated transition structure.

PageRank (Brin & Page 1998) as the stationary distribution of user
journeys: the CORPUS-SCALE work is extracting transition edges from the
event log (one lag window per user — the sessionize shuffle shape); the
resulting graph aggregates to |event_types|² rows, so the power
iteration runs driver-side on that summary — the same
train-on-summary pattern as the k-means/PQ/BPE trainers.  (For graphs
whose NODE set scales with the data — e.g. document near-dup graphs —
the distributed iterative template is ``ml/dedup.connected_components``;
this operator is the small-aggregated-graph complement.)

Bit-determinism (oracle replays every double): per-node incoming
contributions are summed as a LEFT FOLD over the VALUE-SORTED list
(Python ``sorted`` + fold = DuckDB ``list_reduce(list_sort(...))`` =
the same IEEE sequence), and every arithmetic step mirrors the oracle's
operator order exactly.  Dangling-node mass is redistributed uniformly
each iteration, so ranks always sum to 1.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def transition_edges(
    events: DataFrame,
    user_col: str = "user_id",
    type_col: str = "event_type",
    order_cols: tuple[str, ...] = ("ts", "event_id"),
) -> DataFrame:
    """(src, dst, w): counts of consecutive event-type transitions per
    user — one lag window per user (deterministic tie-break on the
    full ``order_cols``), one combinable groupBy.  This is the only
    corpus-scale pass; output is |types|² rows."""
    w = Window.partitionBy(user_col).orderBy(*order_cols)
    return (
        events.withColumn("src", F.lag(type_col).over(w))
        .filter(F.col("src").isNotNull())
        .groupBy("src", F.col(type_col).alias("dst"))
        .agg(F.count(F.lit(1)).alias("w"))
    )


def pagerank_from_edges(
    nodes: list[str],
    edges: list[tuple[str, str, int]],
    damping: float = 0.85,
    iterations: int = 10,
) -> dict[str, float]:
    """Fixed-iteration power method on the (tiny) aggregated graph.

    Every float op mirrors the SQL oracle exactly:
    ``contrib = (rank * w) / out`` left-associated, per-node sums are
    value-sorted left folds, and the update is
    ``(1−d)/n + d·(S + dang/n)`` with that literal bracketing.
    """
    n = float(len(nodes))
    out: dict[str, float] = {}
    for s, _, w in edges:
        out[s] = out.get(s, 0.0) + float(w)
    rank = {v: 1.0 / n for v in nodes}
    base = (1.0 - damping) / n
    for _ in range(iterations):
        contribs: dict[str, list[float]] = {v: [] for v in nodes}
        for s, d_, w in edges:
            contribs[d_].append((rank[s] * float(w)) / out[s])
        dang_terms = sorted(rank[v] for v in nodes if v not in out)
        dang = 0.0
        for t in dang_terms:
            dang = dang + t
        new = {}
        for v in nodes:
            s_ = 0.0
            for c in sorted(contribs[v]):
                s_ = s_ + c
            new[v] = base + damping * (s_ + dang / n)
        rank = new
    return rank


def event_type_pagerank(
    events: DataFrame,
    damping: float = 0.85,
    iterations: int = 10,
) -> DataFrame:
    """(event_type, pagerank): stationary importance of each event type
    in the user-journey Markov chain.  Distributed edge extraction →
    driver iteration → 5-row result."""
    spark = events.sparkSession
    nodes = sorted(
        r["event_type"]
        for r in events.select("event_type").distinct().collect()
    )
    edges = [
        (r["src"], r["dst"], r["w"])
        for r in transition_edges(events).collect()
    ]
    ranks = pagerank_from_edges(nodes, edges, damping, iterations)
    return spark.createDataFrame(
        [(v, ranks[v]) for v in nodes], ["event_type", "pagerank"]
    )

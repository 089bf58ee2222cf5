"""Positional inverted index — the text-retrieval complement to the
vector-ANN family (ml/similarity): term → postings (doc, sorted
positions), built as plain aggregations, queried as equi-joins.

At 100 TB the index IS the product: the corpus is scanned once to build
postings; every subsequent term/AND/phrase query touches only the
queried terms' posting rows (partition-prunable on the term column when
persisted sorted/bucketed by term).  Posting lists are size-capped with
an explicit ``truncated`` flag — a stopword's postings would otherwise
be corpus-sized (the classic index skew); real engines tier or elide
stopword postings, and the cap makes that decision visible instead of
silent.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from processo_etl_spark.ml.dedup import normalize_text


def tokenize_positions(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """(doc, pos, term): 0-based positions over whitespace tokens of the
    normalized text — one narrow explode, no shuffle."""
    toks = F.split(normalize_text(text_col), " ")
    return df.select(
        F.col(id_col).alias("doc"), F.posexplode(toks).alias("pos", "term")
    )


def build_postings(
    df: DataFrame,
    id_col: str,
    text_col: str,
    max_docs_per_term: int = 10_000,
) -> DataFrame:
    """term → (df_count, postings[(doc, positions)], truncated).

    Two combinable groupBys: (term, doc) → sorted position array, then
    term → doc-sorted posting array, sliced at ``max_docs_per_term``
    (deterministic: doc order is total).  Per-task state is one term's
    retained postings — bounded by the cap, not the corpus.
    """
    tp = tokenize_positions(df, id_col, text_col)
    per_doc = tp.groupBy("term", "doc").agg(
        F.sort_array(F.collect_list("pos")).alias("positions")
    )
    return per_doc.groupBy("term").agg(
        F.count(F.lit(1)).alias("df_count"),
        F.slice(
            F.sort_array(
                F.collect_list(F.struct(F.col("doc"), F.col("positions")))
            ),
            1,
            max_docs_per_term,
        ).alias("postings"),
        (F.count(F.lit(1)) > max_docs_per_term).alias("truncated"),
    )


def phrase_query(
    postings: DataFrame, term_a: str, term_b: str
) -> DataFrame:
    """Docs where ``term_a term_b`` occur ADJACENTLY, with occurrence
    counts — the classic positional-index phrase query: explode the two
    terms' postings, equi-join on doc, count positions p of a with p+1
    in b's list.  Only the two queried posting rows are ever read."""
    def side(term: str, suffix: str) -> DataFrame:
        return (
            postings.filter(F.col("term") == term)
            .select(F.explode("postings").alias("p"))
            .select(
                F.col("p.doc").alias("doc"),
                F.col("p.positions").alias(f"pos_{suffix}"),
            )
        )

    a, b = side(term_a, "a"), side(term_b, "b")
    n_phrase = F.size(
        F.filter(
            F.col("pos_a"),
            lambda p: F.array_contains(F.col("pos_b"), p + 1),
        )
    )
    return (
        a.join(b, "doc")
        .select("doc", n_phrase.alias("n_phrase"))
        .filter(F.col("n_phrase") > 0)
    )

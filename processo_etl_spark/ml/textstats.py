"""Text analysis for training-data pipelines: language ID, quality
scoring, token counting, fingerprinting — all native expressions.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from processo_etl_spark.ml.dedup import fingerprint, normalize_text

# Minimal function-word lists for the n-gram/stopword language heuristic.
STOPWORDS = {
    "en": ("the", "a", "of", "and", "to", "in", "is", "it", "that", "for"),
    "es": ("el", "la", "de", "que", "y", "en", "un", "los", "se", "no"),
    "fr": ("le", "la", "de", "et", "les", "des", "un", "une", "du", "est"),
    "de": ("der", "die", "das", "und", "in", "den", "von", "zu", "mit", "ist"),
}


def tokens_ws(c: Column | str) -> Column:
    """Whitespace tokenization of normalized text."""
    return F.split(normalize_text(c), " ")


def token_count_ws(c: Column | str) -> Column:
    return F.size(tokens_ws(c))


def token_count_bpe_regex(c: Column | str) -> Column:
    """BPE-ish token count: words, digit runs, and punctuation pieces.

    A regex proxy for subword tokenizers (letters run | digits run |
    single non-space symbol) — counts pieces, JVM-side.
    """
    col = F.col(c) if isinstance(c, str) else c
    return F.size(F.regexp_extract_all(col, F.lit(r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]"), 0))


def stopword_ratio(c: Column | str, lang: str = "en") -> Column:
    toks = tokens_ws(c)
    hits = F.size(F.filter(toks, lambda x: x.isin(*STOPWORDS[lang])))
    return hits.cast("double") / F.greatest(F.size(toks), F.lit(1)).cast("double")


def detect_language(c: Column | str) -> Column:
    """Pick the language whose function words dominate; 'und' if none hit.

    An n-gram-free heuristic good enough to route documents; swap in a
    proper model via a Pandas UDF when libraries are available.
    """
    toks = tokens_ws(c)
    langs = list(STOPWORDS)

    def _in_list(sw: tuple[str, ...]):
        # unary lambda factory: a two-param lambda would receive the HOF
        # element index as its second argument (PySpark semantics).
        return lambda x: x.isin(*sw)

    # Let-bind the token array, then the score vector: HOFs bypass codegen
    # CSE, so naming these subtrees once avoids re-tokenizing per language
    # and re-scoring per CASE branch.
    def _scores(tk: Column) -> Column:
        return F.array(
            *[F.size(F.filter(tk, _in_list(STOPWORDS[lang]))) for lang in langs]
        )

    scores = F.element_at(F.transform(F.array(toks), _scores), 1)

    def _decide(s: Column) -> Column:
        best = F.array_max(s)
        expr = F.when(best == 0, "und")
        for i, lang in enumerate(langs):  # insertion order breaks ties
            expr = expr.when(F.element_at(s, i + 1) == best, lang)
        return expr

    return F.element_at(F.transform(F.array(scores), _decide), 1)


def quality_features(df: DataFrame, text_col: str) -> DataFrame:
    """Per-document quality features + a composite score in [0,1].

    Score terms use ``floor`` scaling (not round) so every engine agrees
    bit-for-bit; a single narrow projection, no shuffle.
    """
    toks = tokens_ws(text_col)
    n_tok = F.size(toks)
    n_char = F.length(F.col(text_col))
    punct = F.size(F.regexp_extract_all(F.col(text_col), F.lit(r"[^\w\s]"), 0))
    mean_tok_len = (n_char.cast("double") / F.greatest(n_tok, F.lit(1)).cast("double"))
    sw_ratio = stopword_ratio(text_col, "en")
    score = (
        F.least(n_tok.cast("double") / F.lit(100.0), F.lit(1.0)) * F.lit(0.4)
        + F.least(sw_ratio * F.lit(5.0), F.lit(1.0)) * F.lit(0.3)
        + (F.lit(1.0) - F.least(punct.cast("double") / F.greatest(n_char, F.lit(1)).cast("double") * F.lit(10.0), F.lit(1.0))) * F.lit(0.3)
    )
    return df.select(
        "*",
        n_tok.alias("n_tokens"),
        n_char.alias("n_chars_m"),
        mean_tok_len.alias("mean_token_len"),
        sw_ratio.alias("stopword_ratio"),
        (F.floor(score * 1000) / 1000).alias("quality_score"),
    )


def doc_fingerprint(df: DataFrame, text_col: str, id_col: str) -> DataFrame:
    """Stable md5 content fingerprint over normalized text."""
    return df.select(F.col(id_col), fingerprint(text_col).alias("fp"))

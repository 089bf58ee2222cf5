"""HTML → text extraction (WET generation) — pure JVM expressions.

The step between WARC ingestion (sources/warc.py) and the text-curation
family: crawled payloads are HTML; every downstream signal (langid,
quality, dedup, tokenization) wants visible text.  Common Crawl ships
this as the WARC→WET derivation; here it is an expression pipeline —
regexp only, no UDF, whole-stage-codegen-able — with the same spec
re-implemented independently in the DuckDB oracle (plans/web.py).

Extraction spec (the boilerplate-light subset every WET-style extractor
applies; RE2-compatible — no backreferences, so script/style get their
own patterns):
  1. drop <script>…</script> and <style>…</style> blocks (case-insensitive,
     dot-matches-newline, lazy);
  2. drop <!-- comments -->;
  3. drop every remaining tag;
  4. decode the five predefined XML entities + &nbsp; (&amp; LAST, so
     double-escaped text stays escaped once — the standard order);
  5. collapse whitespace runs to one space and trim.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# (pattern, replacement) pipeline — applied in order.
_STRIP = (
    (r"(?is)<script[^>]*>.*?</script>", " "),
    (r"(?is)<style[^>]*>.*?</style>", " "),
    (r"(?s)<!--.*?-->", " "),
    (r"<[^>]+>", " "),
)
# Entity decode order matters: &amp; must be last.
_ENTITIES = (
    ("&lt;", "<"),
    ("&gt;", ">"),
    ("&quot;", '"'),
    ("&#39;", "'"),
    ("&nbsp;", " "),
    ("&amp;", "&"),
)


def html_to_text(html: Column | str) -> Column:
    """Visible text of an HTML fragment per the module spec."""
    c = F.col(html) if isinstance(html, str) else html
    for pat, rep in _STRIP:
        c = F.regexp_replace(c, pat, rep)
    for ent, ch in _ENTITIES:
        c = F.replace(c, F.lit(ent), F.lit(ch))
    return F.trim(F.regexp_replace(c, r"\s+", " "))

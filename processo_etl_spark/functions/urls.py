"""URL canonicalization and domain extraction — web-corpus curation.

Extension surface (no reference counterpart — the reference's keys are
already clean CSV ids; a web-scale pipeline's document key is a URL):
canonicalize before dedup/caps so ``HTTPS://Host:443/p?utm_source=x&a=1``
and ``https://host/p?a=1`` collapse to one identity, then group by
registered domain for per-domain quality budgets (the CCNet/Gopher
"per-domain cap" posture, quality_budget_per_source's web twin).

Everything here is JVM-side expression trees (regexp + array HOFs over
the per-URL param list) — no UDFs, whole-stage-codegen-able, and exact:
string transforms carry no float parity risk, so the DuckDB oracles
re-implement the same spec independently (regexp/list functions) and the
driver hash must agree byte-for-byte.

Canonicalization spec (subset of RFC 3986 normalization + the tracker
strip every crawler applies):
  1. drop the fragment;
  2. lowercase scheme and authority (path/query case is significant);
  3. strip default ports (``http:80``, ``https:443``);
  4. drop tracking params (``utm_*``, ``fbclid``, ``gclid``, ``ref``);
  5. sort surviving params bytewise (order-insensitive identity).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# Authority-prefix matcher: scheme '://' then everything up to the first
# '/', '?' or '#'.
_PREFIX_RE = "^([a-zA-Z][a-zA-Z0-9+.-]*://[^/?#]*)"
# Params dropped by canonicalization (match on 'name=').
TRACKING_RE = "^(utm_[A-Za-z0-9_]*|fbclid|gclid|ref)="


def url_canonicalize(url: Column | str) -> Column:
    """Canonical form of ``url`` per the module spec — pure expressions."""
    u = F.col(url) if isinstance(url, str) else url
    no_frag = F.regexp_replace(u, "#.*$", "")
    prefix = F.lower(F.regexp_extract(no_frag, _PREFIX_RE, 1))
    prefix = F.regexp_replace(prefix, "^(https://[^/:]+):443$", "$1")
    prefix = F.regexp_replace(prefix, "^(http://[^/:]+):80$", "$1")
    path = F.regexp_extract(
        no_frag, "^[a-zA-Z][a-zA-Z0-9+.-]*://[^/?#]*([^?#]*)", 1
    )
    query = F.regexp_extract(no_frag, r"\?([^#]*)", 1)
    kept = F.filter(
        F.split(query, "&"),
        lambda x: (x != F.lit("")) & ~x.rlike(TRACKING_RE),
    )
    qs = F.array_join(F.array_sort(kept), "&")
    # Let-bind qs via a 1-element transform (HOFs bypass codegen CSE, so
    # a plain CASE WHEN would evaluate the filter+sort+join chain twice).
    q_part = F.transform(
        F.array(qs),
        lambda q: F.when(q == "", F.lit("")).otherwise(
            F.concat(F.lit("?"), q)
        ),
    )[0]
    return F.concat(prefix, path, q_part)


def url_host(url: Column | str) -> Column:
    """Hostname (no port) — Spark's ``parse_url``, an implementation
    INDEPENDENT of the regexp pipeline above and of the DuckDB oracle's
    extraction, which strengthens the differential."""
    u = F.col(url) if isinstance(url, str) else url
    return F.parse_url(u, F.lit("HOST"))


def url_registered_domain(host: Column | str) -> Column:
    """Last-two-labels registered domain (``a.b.example.com`` →
    ``example.com``).  Heuristic: a real deployment substitutes the
    public-suffix list (``co.uk``-class suffixes need it); the grouping
    shape — and everything the engine does with the column — is
    identical, so the list is a lookup-table swap, not a plan change."""
    h = F.col(host) if isinstance(host, str) else host
    return F.regexp_extract(h, r"([^.]+\.[^.]+)$", 1)

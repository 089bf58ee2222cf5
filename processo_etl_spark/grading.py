"""Grading-contract definitions shared by the local harness, the test
suite, and the registry.

The correctness driver canonicalizes each query's Spark and DuckDB
results with pandas (``sort_values`` over every column) and hashes the
values.  Two output-schema rules follow, enforced in three places
(tools/check_oracles.py, tests/test_scale.py's plan audit, and the
registry conventions) — this module is the ONE definition all of them
import, so widening a ban or adding a canary is a single edit:

- **No DecimalType outputs** (r2 lesson: the driver hashes Spark vs
  DuckDB decimals differently regardless of value).  The two
  ``canary_decimal_*`` probes are the deliberate exception — they exist
  to document that driver behavior and are never placed in a graded
  window slot.
- **No array/map/struct outputs** (r5 lesson: pandas ``sort_values``
  throws ``unhashable type: 'list'``, so any non-scalar column is an
  automatic driver ERR even when the values match).  Flatten with
  ``posexplode`` ⇔ ``unnest(generate_series)``.
- **No raw-double fold outputs** (r7 lesson: ``drift_chi2_sources``
  hash-failed on the driver even though its 512-term value-sorted
  double fold was locally bit-identical under DuckDB 1.0.0 — the
  driver's DuckDB build evaluated the fold one ULP differently, the
  first loss for the "bit-exact replay" gamble).  Any query whose
  oracle contains a multi-term float-reduction idiom must emit each
  double output column through ``ROUND(expr, s)`` on BOTH sides
  (scale chosen so the rounding quantum is decades above the
  worst-case cross-engine ULP drift), or carry an explicit
  (query, column) allow-list entry below with a recorded
  justification — e.g. a single division of exact integers, which is
  one correctly-rounded IEEE op on both engines.
"""

from __future__ import annotations

import re

# The driver-normalization probes: the ONLY queries allowed DecimalType
# outputs, and permanently excluded from graded window slots.
DECIMAL_CANARIES = frozenset({"canary_decimal_12_2", "canary_decimal_20_6"})

# Queries whose PLAN CONSTRUCTION executes bounded eager jobs (the
# documented two-pass literal-inject class: fold a scalar, inject it as
# a literal, release the cache before returning).  Schema-only sweeps
# (tools/check_oracles.py --schema) must skip them alongside stream_*:
# "build the plan lazily, read the schema" would otherwise run the full
# upstream job — for the triangle head that is the 30M-edge distinct
# co-purchase build at stress scales (ADVICE r11).  The main
# differential path still runs and grades them.
EAGER_AT_BUILD = frozenset(
    {
        "graph_triangle_estimate_sampled",
        # r13 activation: three bounded literal-inject jobs at plan
        # construction (day count, the exact two-pass quantile bracket,
        # the per-quantile histogram-bucket lookup) — all over the
        # ≤5k-cell bounded histogram, never a raw-data re-scan.
        "quantile_daily_histogram_merge",
    }
)

# The r9 one-shot diagnostic whose PURPOSE was emitting bare
# ``sum(BIGINT)`` (DuckDB HUGEINT) to localize the drift_chi2_sources
# hash divergence — its red driver row is the recorded proof that the
# driver canonicalizes int128 differently from Spark LongType.  It is
# retired from rotation (plans._ONE_SHOT_PROBES) and is the only oracle
# exempt from the structural HUGEINT output ban; every other oracle
# must CAST integer aggregates AS BIGINT.
HUGEINT_PROBE_EXEMPT = frozenset({"drift_probe_ints"})


def decimal_output_cols(schema) -> list[str]:
    """Names of output columns whose type contains a DecimalType
    (recursing into arrays/maps/structs)."""
    from pyspark.sql.types import ArrayType, DecimalType, MapType, StructType

    def has_dec(dt) -> bool:
        if isinstance(dt, DecimalType):
            return True
        if isinstance(dt, ArrayType):
            return has_dec(dt.elementType)
        if isinstance(dt, MapType):
            return has_dec(dt.keyType) or has_dec(dt.valueType)
        if isinstance(dt, StructType):
            return any(has_dec(f.dataType) for f in dt.fields)
        return False

    return [f.name for f in schema.fields if has_dec(f.dataType)]


def nonscalar_output_cols(schema) -> list[str]:
    """Names of output columns with an unhashable (non-scalar) type —
    ArrayType/MapType/StructType at the top level."""
    from pyspark.sql.types import ArrayType, MapType, StructType

    return [
        f.name
        for f in schema.fields
        if isinstance(f.dataType, (ArrayType, MapType, StructType))
    ]


# --- raw-double fold guard (r7 lesson, VERDICT r7 #2) -----------------------------

# Oracle-SQL idioms that materialize a multi-term float reduction.  The
# Spark side of such a query necessarily replays the same fold (that is
# the whole oracle strategy), so scanning the oracle text catches the
# pair.
FLOAT_FOLD_MARKERS = ("list_reduce", "list_aggregate", "with recursive")

# (query -> column -> justification): double output columns of
# fold-marker queries that are exempt from the ROUND requirement.
# Every entry must state WHY the value is engine-portable without
# rounding.  Keep this list short — the default is ROUND.
RAW_DOUBLE_FOLD_ALLOWED: dict[str, dict[str, str]] = {
    # recall@5 = count(hits)/count(gold): a single division of exact
    # small integers — one correctly-rounded IEEE op, identical on any
    # engine.  The list_reduce in its oracle computes cosine for
    # RANKING only; no fold value reaches the output.
    "retrieval_eval_recall": {
        "recall_at_5": "single division of exact integers; fold ranks only"
    },
    # 1/rank (or the exact literal 0.0 on a miss): same class.
    "retrieval_eval_mrr": {
        "reciprocal_rank": "single division of exact integers; fold ranks only"
    },
    # `value` is a raw parquet column passthrough — the same stored
    # double on both sides, no arithmetic at all.  `ewma` is a
    # FIXED-POINT INTEGER recurrence (E = (3E+V) >> 2 on scaled longs,
    # operators/temporal.ewma_per_key(fixed_point_scale=8)) — no float
    # op until the final single exact-integer division by 10⁸, which is
    # one correctly-rounded IEEE op on any engine.
    "ewma_user_value": {
        "value": "raw parquet source passthrough",
        "ewma": "fixed-point long recurrence; single exact-int division",
    },
}


def _last_alias_round_wrapped(sql: str, col: str) -> bool | None:
    """Whether the LAST ``AS <col>`` occurrence in ``sql`` aliases an
    expression WHOLLY wrapped in ROUND(...) — the last occurrence is
    the final SELECT's in every registry oracle.  None = no
    ``AS <col>`` alias at all (a bare column reference or source
    passthrough — the caller treats that as not-wrapped).

    The check extracts the FULL aliased expression (scan back to the
    nearest enclosing comma or open-paren at depth 0) and requires it
    to be ``ROUND(...)`` or ``CAST(ROUND(...) AS type)`` in its
    entirety: a trailing ROUND sub-expression (``raw_fold + ROUND(adj,
    6) AS col``) must NOT mask an unrounded fold reaching the output
    (review r8 — the paren-match-only version had exactly that false
    negative)."""
    matches = list(re.finditer(rf"\bAS\s+{re.escape(col)}\b", sql, re.IGNORECASE))
    if not matches:
        return None
    pre = sql[: matches[-1].start()]
    depth = 0
    start = 0
    for i in range(len(pre) - 1, -1, -1):
        c = pre[i]
        if c == ")":
            depth += 1
        elif c == "(":
            if depth == 0:  # the enclosing call/subquery boundary
                start = i + 1
                break
            depth -= 1
        elif c == "," and depth == 0:  # previous select-list item
            start = i + 1
            break
    # The backward scan can walk over a PRECEDING balanced group (an
    # earlier CTE body), so the slice may still carry leading SQL.  The
    # aliased expression is ONE of: the full slice, or the suffix after
    # some SELECT keyword inside it (the final select's own SELECT, or
    # — when the expression itself embeds a scalar subquery — none of
    # them).  Testing every candidate is safe because the whole-call
    # check below requires the ENTIRE candidate to be one balanced
    # ROUND(...) call: a mid-expression suffix can never fake that
    # (review r8 — the trim-at-last-SELECT version broke
    # ``ROUND((SELECT ...) * x, 6) AS col``).
    sl = pre[start:]
    candidates = [sl] + [
        sl[m.end() :] for m in re.finditer(r"\bSELECT\b", sl, re.IGNORECASE)
    ]

    def whole_call(e: str, head: str) -> str | None:
        """If ``e`` starts with ``head(`` and that call's closing paren
        is e's LAST char, return the text inside the call; else None.
        (A plain regex ``head\\(.*\\)`` would accept
        ``ROUND(a,6) + fold(...)`` — the parens must balance.)"""
        m = re.match(rf"{head}\s*\(", e, re.IGNORECASE)
        if not m:
            return None
        depth = 1
        for i in range(m.end(), len(e)):
            if e[i] == "(":
                depth += 1
            elif e[i] == ")":
                depth -= 1
                if depth == 0:
                    return e[m.end() : i] if i == len(e) - 1 else None
        return None

    for cand in candidates:
        expr = cand.strip()
        if expr.upper().startswith("DISTINCT "):
            expr = expr[len("DISTINCT ") :].strip()
        # unwrap CAST layers repeatedly: CAST(CAST(ROUND(v, 2) AS
        # DECIMAL(12,2)) AS DOUBLE) is the repo's standard exact-value
        # emission idiom (review r8 — one layer was not enough)
        while True:
            inner = whole_call(expr, "cast")
            if inner is None:
                break
            expr = re.sub(
                r"\s+as\s+\w+(\s*\(\s*\d+(\s*,\s*\d+)?\s*\))?\s*$",
                "",
                inner,
                flags=re.IGNORECASE,
            ).strip()
        if whole_call(expr, "round") is not None:
            return True
    return False


def raw_double_fold_hazards(
    name: str, oracle_sql: str, double_cols: list[str]
) -> list[str]:
    """Double output columns of a fold-marker query that are neither
    ROUND-wrapped in the oracle's final SELECT nor allow-listed.

    ``double_cols`` are the Spark result's DoubleType/FloatType output
    column names (the caller reads them off the schema)."""
    low = oracle_sql.lower()
    if not any(m in low for m in FLOAT_FOLD_MARKERS):
        return []
    allowed = RAW_DOUBLE_FOLD_ALLOWED.get(name, {})
    return [
        c
        for c in double_cols
        if c not in allowed and _last_alias_round_wrapped(oracle_sql, c) is not True
    ]


def double_output_cols(schema) -> list[str]:
    """Names of top-level DoubleType/FloatType output columns."""
    from pyspark.sql.types import DoubleType, FloatType

    return [
        f.name
        for f in schema.fields
        if isinstance(f.dataType, (DoubleType, FloatType))
    ]

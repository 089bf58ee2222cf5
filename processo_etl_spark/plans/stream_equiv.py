"""Streaming ⇔ batch equivalence certificates for the remaining eight
``stream_*`` jobs (VERDICT r11 #4 — the r11 sessionize/tumbling pattern
at plans/events.py:1733, extended to the whole streaming surface).

Each head drains the REAL streaming job (file source → watermark/state →
availableNow → memory sink, streaming/jobs.py) AND runs its batch twin,
full-outer-joins the two result tables, and counts disagreements
Spark-side with null-safe comparison (ADVICE r11: a one-sided NULL must
bump ``n_mismatch``, never null the OR out of the sum).  The oracle
computes the batch semantics in pure SQL and pins ``n_mismatch = 0``,
so ANY streaming divergence — state-fold bug, watermark drop, sink
replay duplicate, dedup miss — is a driver value-hash mismatch, not
just a pytest assertion.  This upgrades the streaming surface from
rows-only driver evidence (r10) to hash-graded evidence for all ten
jobs.

Reference relevance: the reference (dag.py) is batch-only; SURVEY §2.9
treats streaming as a scale extension whose CONTRACT is the batch
semantics — exactly what these certificates pin.

Scale notes (100 TB): every certificate's join is on the twin's natural
key (event_type / segment / doc_id / word / (row,bucket) / user_id /
(purchase_id,user_id)) — the same shuffle the batch twin already does;
the sketch/filter certificates join FIXED-size grids (≤ d·w cells,
≤ m/32 words) so their compare cost is constant regardless of input
size.  The certificates are certification harnesses, not hot-path
operators: production runs the streaming job alone.
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from processo_etl_spark.ml.dedup import MERSENNE_P, perm_constants
from processo_etl_spark.plans import register
from processo_etl_spark.plans.common import t
from processo_etl_spark.plans.mlops import _md5_long_sql, _NORM


def _disagree(*pairs: tuple[str, str]):
    """Null-safe row-level disagreement predicate over (stream_col,
    batch_col) pairs: any value difference — including a one-sided NULL,
    which is what a row missing from one engine looks like after the
    full-outer join — flags the row (ADVICE r11: eqNullSafe, so a
    NULL-vs-value difference can never null the OR out of the sum).
    Both-NULL agrees: a value legitimately NULL on both engines is not
    a divergence."""
    d = F.lit(False)
    for s, b in pairs:
        d = d | ~F.col(s).eqNullSafe(F.col(b))
    return d


@register(
    "stream_batch_equiv_dedup",
    oracle="""
    WITH batch AS (
      SELECT event_type, count(*) AS n FROM events GROUP BY 1)
    SELECT CAST(count(*) AS BIGINT) AS n_types_stream,
           CAST(count(*) AS BIGINT) AS n_types_batch,
           CAST(SUM(n) AS BIGINT) AS total_events,
           CAST(0 AS BIGINT) AS n_mismatch
    FROM batch
    """,
)
def stream_batch_equiv_dedup(spark, sf_dir):
    """Certificate: the events source unioned with a second read of
    itself (every event arrives TWICE), deduped by event_id with
    ``dropDuplicatesWithinWatermark`` (bounded state), aggregated
    per-type, equals the single-copy batch counts exactly.  A dedup
    that missed a duplicate inflates a per-type count; one that dropped
    a non-duplicate deflates it — either moves n_mismatch and the
    driver hash goes red."""
    from processo_etl_spark.streaming import jobs

    stream = jobs.run_dedup_availablenow(
        spark, sf_dir, duplicate_input=True
    ).select("event_type", F.col("n").alias("s_n"))
    batch = (
        t(spark, sf_dir, "events")
        .groupBy("event_type")
        .agg(F.count(F.lit(1)).alias("b_n"))
    )
    joined = stream.join(batch, "event_type", "full_outer")
    return joined.agg(
        F.count("s_n").cast("bigint").alias("n_types_stream"),
        F.count("b_n").cast("bigint").alias("n_types_batch"),
        F.sum("b_n").cast("bigint").alias("total_events"),
        F.sum(_disagree(("s_n", "b_n")).cast("long"))
        .cast("bigint")
        .alias("n_mismatch"),
    )


@register(
    "stream_batch_equiv_interval_join",
    oracle="""
    WITH batch AS (
      SELECT p.event_id AS purchase_id, p.user_id, count(*) AS n_views
      FROM (SELECT * FROM events WHERE event_type = 'purchase') p
      JOIN (SELECT * FROM events WHERE event_type = 'view') v
        ON v.user_id = p.user_id
       AND v.ts <= p.ts AND v.ts >= p.ts - INTERVAL 1 HOUR
      GROUP BY 1, 2)
    SELECT CAST(count(*) AS BIGINT) AS n_pairs_stream,
           CAST(count(*) AS BIGINT) AS n_pairs_batch,
           CAST(SUM(n_views) AS BIGINT) AS total_views,
           CAST(0 AS BIGINT) AS n_mismatch
    FROM batch
    """,
)
def stream_batch_equiv_interval_join(spark, sf_dir):
    """Certificate: the watermarked stream-stream interval join (view
    within the hour before each purchase, time-bounded join state)
    equals the batch time-bound join pair-for-pair.  Join state that
    expired a view too early drops pairs; a replayed micro-batch
    duplicates them — both move a per-pair count and the hash goes
    red."""
    from processo_etl_spark.plans.events import interval_join_purchase_views
    from processo_etl_spark.streaming import jobs

    stream = jobs.run_interval_join_availablenow(spark, sf_dir).select(
        "purchase_id", "user_id", F.col("n_views").alias("s_views")
    )
    batch = interval_join_purchase_views(spark, sf_dir).select(
        "purchase_id", "user_id", F.col("n_views").alias("b_views")
    )
    joined = stream.join(batch, ["purchase_id", "user_id"], "full_outer")
    return joined.agg(
        F.count("s_views").cast("bigint").alias("n_pairs_stream"),
        F.count("b_views").cast("bigint").alias("n_pairs_batch"),
        F.sum("b_views").cast("bigint").alias("total_views"),
        F.sum(_disagree(("s_views", "b_views")).cast("long"))
        .cast("bigint")
        .alias("n_mismatch"),
    )


@register(
    "stream_batch_equiv_enrich",
    oracle="""
    WITH batch AS (
      SELECT COALESCE(c.c_mktsegment, 'UNKNOWN') AS segment, count(*) AS n
      FROM events e LEFT JOIN customer c ON e.user_id = c.c_custkey
      GROUP BY 1)
    SELECT CAST(count(*) AS BIGINT) AS n_segments_stream,
           CAST(count(*) AS BIGINT) AS n_segments_batch,
           CAST(SUM(n) AS BIGINT) AS total_events,
           CAST(0 AS BIGINT) AS n_mismatch
    FROM batch
    """,
)
def stream_batch_equiv_enrich(spark, sf_dir):
    """Certificate: the stream-static broadcast enrichment join equals
    the batch left join per segment — counts AND the exact-decimal
    value sums (compared Spark-side with eqNullSafe; both sides fold in
    DECIMAL, so the doubles are bit-identical when correct).  A
    micro-batch that re-read a stale dim snapshot or dropped rows on
    the stream side moves a segment count or sum → hash red."""
    from processo_etl_spark.plans.events import enrich_events_segment
    from processo_etl_spark.streaming import jobs

    stream = jobs.run_enrich_availablenow(spark, sf_dir).select(
        "segment",
        F.col("n").alias("s_n"),
        F.col("total_value").alias("s_value"),
    )
    batch = enrich_events_segment(spark, sf_dir).select(
        "segment",
        F.col("n").alias("b_n"),
        F.col("total_value").alias("b_value"),
    )
    joined = stream.join(batch, "segment", "full_outer")
    return joined.agg(
        F.count("s_n").cast("bigint").alias("n_segments_stream"),
        F.count("b_n").cast("bigint").alias("n_segments_batch"),
        F.sum("b_n").cast("bigint").alias("total_events"),
        F.sum(
            _disagree(("s_n", "b_n"), ("s_value", "b_value")).cast("long")
        )
        .cast("bigint")
        .alias("n_mismatch"),
    )


@register(
    "stream_batch_equiv_curate",
    oracle=f"""
    WITH feats AS (
      SELECT doc_id,
        len(string_split({_NORM}, ' ')) AS n_tokens,
        length(text) AS n_chars_m,
        len(regexp_extract_all(text, '[^\\w\\s]')) AS punct,
        CAST(len(list_filter(string_split({_NORM}, ' '),
             x -> x IN ('the','a','of','and','to','in','is','it','that','for'))) AS DOUBLE)
          / CAST(greatest(len(string_split({_NORM}, ' ')), 1) AS DOUBLE) AS sw_ratio
      FROM documents),
    scored AS (
      SELECT doc_id, n_tokens,
        FLOOR((least(CAST(n_tokens AS DOUBLE) / 100.0, 1.0) * 0.4
             + least(sw_ratio * 5.0, 1.0) * 0.3
             + (1.0 - least(CAST(punct AS DOUBLE) / CAST(greatest(n_chars_m, 1) AS DOUBLE) * 10.0, 1.0)) * 0.3
              ) * 1000) / 1000 AS quality_score
      FROM feats),
    kept AS (SELECT * FROM scored WHERE quality_score >= 0.3)
    SELECT CAST(count(*) AS BIGINT) AS n_docs_stream,
           CAST(count(*) AS BIGINT) AS n_docs_batch,
           CAST(SUM(n_tokens) AS BIGINT) AS total_tokens,
           CAST(0 AS BIGINT) AS n_mismatch
    FROM kept
    """,
)
def stream_batch_equiv_curate(spark, sf_dir):
    """Certificate: ingest-time streaming curation (quality-score +
    language-id + threshold filter, stateless narrow maps) equals the
    batch filter over the same table doc-for-doc — lang_pred, n_tokens
    AND the floor-scaled quality_score (eqNullSafe; identical HOF folds
    both sides, so the doubles are bit-identical when correct).  The
    oracle replays the score in SQL (the hash-green text_quality_score
    fragment) and pins the kept-set size and token mass."""
    from processo_etl_spark.ml import textstats
    from processo_etl_spark.streaming import jobs

    stream = jobs.run_curate_availablenow(spark, sf_dir).select(
        "doc_id",
        F.col("lang_pred").alias("s_lang"),
        F.col("n_tokens").alias("s_tokens"),
        F.col("quality_score").alias("s_score"),
    )
    docs = t(spark, sf_dir, "documents")
    batch = (
        textstats.quality_features(docs, "text")
        .withColumn("lang_pred", textstats.detect_language("text"))
        .filter(F.col("quality_score") >= 0.3)
        .select(
            "doc_id",
            F.col("lang_pred").alias("b_lang"),
            F.col("n_tokens").alias("b_tokens"),
            F.col("quality_score").alias("b_score"),
        )
    )
    joined = stream.join(batch, "doc_id", "full_outer")
    return joined.agg(
        F.count("s_tokens").cast("bigint").alias("n_docs_stream"),
        F.count("b_tokens").cast("bigint").alias("n_docs_batch"),
        F.sum("b_tokens").cast("bigint").alias("total_tokens"),
        F.sum(
            _disagree(
                ("s_lang", "b_lang"),
                ("s_tokens", "b_tokens"),
                ("s_score", "b_score"),
            ).cast("long")
        )
        .cast("bigint")
        .alias("n_mismatch"),
    )


def _bloom_word_sql(n_bits: int, k: int) -> str:
    """SQL CTE body rebuilding ml/bloom._word_masks for the events
    user_id key: k affine positions over the md5-prefix base hash, OR'd
    into m/32 words — the same shared-constant discipline as the
    MinHash/CMS oracles (constants from ml.dedup.perm_constants)."""
    h = f"{_md5_long_sql('CAST(user_id AS VARCHAR)')} % {MERSENNE_P}"
    pos = ", ".join(
        f"((({a} * h) + {b}) % {MERSENNE_P}) % {n_bits}"
        for a, b in perm_constants(k)
    )
    return f"""
    hashed AS (SELECT {h} AS h FROM events),
    pos AS (SELECT unnest([{pos}]) AS p FROM hashed),
    filt AS (
      SELECT p // 32 AS word,
             bit_or(CAST(1 AS BIGINT) << CAST(p % 32 AS INT)) AS bits
      FROM pos GROUP BY 1)"""


@register(
    "stream_batch_equiv_bloom",
    oracle=f"""
    WITH {_bloom_word_sql(1 << 16, 4)}
    SELECT CAST(count(*) AS BIGINT) AS n_words_stream,
           CAST(count(*) AS BIGINT) AS n_words_batch,
           CAST(SUM(bit_count(bits)) AS BIGINT) AS n_set_bits,
           CAST(0 AS BIGINT) AS n_mismatch
    FROM filt
    """,
)
def stream_batch_equiv_bloom(spark, sf_dir):
    """Certificate: the streaming Bloom build (bounded m/32-word state)
    equals the batch ``bloom_build`` word-for-word, bit-for-bit — the
    oracle rebuilds the whole filter in SQL from the shared hash
    constants and pins the word count AND the exact number of set bits,
    so a single flipped bit anywhere in the 64 Kb filter is a hash
    red."""
    from processo_etl_spark.ml import bloom
    from processo_etl_spark.streaming import jobs

    stream = jobs.run_bloom_filter_availablenow(spark, sf_dir).select(
        "word", F.col("bits").alias("s_bits")
    )
    batch = bloom.bloom_build(
        t(spark, sf_dir, "events").select(
            F.col("user_id").cast("string").alias("user_id")
        ),
        "user_id",
    ).select("word", F.col("bits").alias("b_bits"))
    joined = stream.join(batch, "word", "full_outer")
    return joined.agg(
        F.count("s_bits").cast("bigint").alias("n_words_stream"),
        F.count("b_bits").cast("bigint").alias("n_words_batch"),
        F.sum(F.bit_count("b_bits")).cast("bigint").alias("n_set_bits"),
        F.sum(_disagree(("s_bits", "b_bits")).cast("long"))
        .cast("bigint")
        .alias("n_mismatch"),
    )


def _cms_cells_sql(depth: int, width: int) -> str:
    """SQL CTE body rebuilding ml/sketches._bucket_structs for the
    events event_type key (same constants as the cms_heavy_hitters
    oracle, same d×w grid as streaming/jobs.cms_sketch_stream)."""
    h = f"{_md5_long_sql('event_type')} % {MERSENNE_P}"
    rows = " UNION ALL ".join(
        f"SELECT {i} AS row,"
        f" ((({a} * h) + {b}) % {MERSENNE_P}) % {width} AS bucket FROM hashed"
        for i, (a, b) in enumerate(perm_constants(depth))
    )
    return f"""
    hashed AS (SELECT {h} AS h FROM events),
    cells AS ({rows}),
    sketch AS (SELECT row, bucket, count(*) AS cnt FROM cells GROUP BY 1, 2)"""


@register(
    "stream_batch_equiv_cms",
    oracle=f"""
    WITH {_cms_cells_sql(4, 256)}
    SELECT CAST(count(*) AS BIGINT) AS n_cells_stream,
           CAST(count(*) AS BIGINT) AS n_cells_batch,
           CAST(SUM(cnt) AS BIGINT) AS total_count,
           CAST(0 AS BIGINT) AS n_mismatch
    FROM sketch
    """,
)
def stream_batch_equiv_cms(spark, sf_dir):
    """Certificate: the streaming Count-Min build (bounded d·w state)
    equals the batch ``cms_build`` cell-for-cell — the oracle rebuilds
    the sketch in SQL and pins the occupied-cell count and total mass
    (= depth × |events|), so one miscounted cell anywhere in the 4×256
    grid is a hash red."""
    from processo_etl_spark.ml import sketches
    from processo_etl_spark.streaming import jobs

    stream = jobs.run_cms_sketch_availablenow(spark, sf_dir).select(
        "row", "bucket", F.col("cnt").alias("s_cnt")
    )
    batch = sketches.cms_build(
        t(spark, sf_dir, "events"), "event_type"
    ).select("row", "bucket", F.col("cnt").alias("b_cnt"))
    joined = stream.join(batch, ["row", "bucket"], "full_outer")
    return joined.agg(
        F.count("s_cnt").cast("bigint").alias("n_cells_stream"),
        F.count("b_cnt").cast("bigint").alias("n_cells_batch"),
        F.sum("b_cnt").cast("bigint").alias("total_count"),
        F.sum(_disagree(("s_cnt", "b_cnt")).cast("long"))
        .cast("bigint")
        .alias("n_mismatch"),
    )


@register(
    "stream_batch_equiv_ewma",
    oracle="""
    WITH u AS (
      SELECT user_id, count(*) AS n
      FROM events WHERE value IS NOT NULL GROUP BY 1)
    SELECT CAST(count(*) AS BIGINT) AS n_users_stream,
           CAST(count(*) AS BIGINT) AS n_users_batch,
           CAST(SUM(n) AS BIGINT) AS total_rows,
           CAST(0 AS BIGINT) AS n_mismatch
    FROM u
    """,
)
def stream_batch_equiv_ewma(spark, sf_dir):
    """Certificate: the stateful streaming EWMA (watermark-frontier
    settle + provisional fold) equals the batch FLOAT operator
    (temporal.ewma_per_key's default path) per user — row counts AND
    the final ewma value compared bitwise with eqNullSafe (the settled
    and provisional folds execute the identical multiply-add sequence
    over the identical (ts, event_id) order).  A dropped row, a
    mis-ordered fold, or a revised-but-wrong provisional value moves
    n_mismatch → hash red."""
    from processo_etl_spark.operators import temporal
    from processo_etl_spark.streaming import jobs

    stream = (
        jobs.run_ewma_availablenow(spark, sf_dir, alpha=0.25)
        .filter((F.col("n_settled") + F.col("n_pending")) > 0)
        .select(
            "user_id",
            (F.col("n_settled") + F.col("n_pending")).alias("s_rows"),
            F.col("ewma").alias("s_ewma"),
        )
    )
    ev = t(spark, sf_dir, "events").filter(F.col("value").isNotNull())
    folded = temporal.ewma_per_key(
        ev, "user_id", ["ts", "event_id"], "value", alpha=0.25
    )
    w = Window.partitionBy("user_id").orderBy(
        F.desc("ts"), F.desc("event_id")
    )
    batch = (
        folded.withColumn("__rn", F.row_number().over(w))
        .withColumn(
            "b_rows", F.count(F.lit(1)).over(Window.partitionBy("user_id"))
        )
        .filter(F.col("__rn") == 1)
        .select("user_id", "b_rows", F.col("ewma").alias("b_ewma"))
    )
    joined = stream.join(batch, "user_id", "full_outer")
    return joined.agg(
        F.count("s_rows").cast("bigint").alias("n_users_stream"),
        F.count("b_rows").cast("bigint").alias("n_users_batch"),
        F.sum("b_rows").cast("bigint").alias("total_rows"),
        F.sum(
            _disagree(("s_rows", "b_rows"), ("s_ewma", "b_ewma")).cast(
                "long"
            )
        )
        .cast("bigint")
        .alias("n_mismatch"),
    )


@register(
    "stream_batch_equiv_media",
    oracle="""
    WITH ids AS (SELECT unnest(generate_series(0, 31)) AS id),
         ks AS (SELECT unnest(generate_series(0, 63)) AS k),
         px AS (SELECT (id * 29 + k * 5) % 256 AS v FROM ids CROSS JOIN ks)
    SELECT CAST(32 AS BIGINT) AS n_files_stream,
           CAST(32 AS BIGINT) AS n_files_batch,
           CAST(SUM(v) AS BIGINT) AS total_pixel_mass,
           CAST(0 AS BIGINT) AS n_mismatch
    FROM px
    """,
)
def stream_batch_equiv_media(spark, sf_dir):
    """Certificate for the binaryFile-STREAM ingest surface: 32
    deterministic 8×8 grayscale PNGs (pixel k of image i =
    (i·29 + k·5) mod 256, vendored ml/png codec; two files land in a
    nested date-partitioned subdir to exercise recursiveFileLookup)
    are drained through the streaming auto-ingest decode
    (streaming/jobs.run_media_features_availablenow: binaryFile file
    stream → Arrow mapInPandas real decode) AND the batch twin
    (ml/multimodal.read_binary_media + extract_features), full-outer
    joined on the md5-path media_id, byte counts and the 8-double
    feature vectors compared null-safely (identical decode code both
    sides — bitwise when correct).  The oracle additionally pins the
    DECODED CONTENT in closed form: feature[c] = Σ_r px(r,c)/(8·255),
    so Σ features × 8·255 per image recovers the exact integer pixel
    mass, summed across the corpus and stated by SQL from the synth
    formula — a decode bug that produced plausible-but-wrong pixels
    would match counts yet miss the mass.  Rounding is exact: each
    per-image mass is an integer recovered from 8 one-division IEEE
    quotients, decades above float error.  sf_dir is unused (synthetic
    fixture corpus, same convention as multimodal_resize)."""
    import os
    import tempfile

    from processo_etl_spark.ml import multimodal, png
    from processo_etl_spark.streaming import jobs

    d = tempfile.mkdtemp(prefix="media_cert_")
    os.mkdir(os.path.join(d, "2026-08"))
    for i in range(32):
        px = bytes((i * 29 + k * 5) % 256 for k in range(64))
        sub = "2026-08" if i % 16 == 9 else ""
        with open(os.path.join(d, sub, f"img_{i:03d}.png"), "wb") as fh:
            fh.write(png.encode_gray(px, 8, 8))

    stream = jobs.run_media_features_availablenow(spark, d).select(
        "media_id",
        F.col("n_bytes").alias("s_bytes"),
        F.col("feature").alias("s_feature"),
    )
    batch = multimodal.extract_features(
        multimodal.read_binary_media(spark, d, glob="*.png"),
        n_features=8,
        real_decode=True,
    ).select(
        "media_id",
        F.col("n_bytes").alias("b_bytes"),
        F.col("feature").alias("b_feature"),
    )
    joined = stream.join(batch, "media_id", "full_outer")
    mass = F.round(
        F.aggregate("b_feature", F.lit(0.0), lambda a, x: a + x) * 8 * 255
    ).cast("bigint")
    return joined.agg(
        F.count("s_bytes").cast("bigint").alias("n_files_stream"),
        F.count("b_bytes").cast("bigint").alias("n_files_batch"),
        F.sum(mass).cast("bigint").alias("total_pixel_mass"),
        F.sum(
            _disagree(
                ("s_bytes", "b_bytes"), ("s_feature", "b_feature")
            ).cast("long")
        )
        .cast("bigint")
        .alias("n_mismatch"),
    )


@register(
    "stream_batch_equiv_sessionize_tws",
    oracle="""
    WITH seq AS (
      SELECT user_id, ts,
        CASE WHEN lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL
               OR epoch(ts) - epoch(lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)) > 1800
             THEN 1 ELSE 0 END AS new_session
      FROM events),
    batch AS (
      SELECT user_id, CAST(SUM(new_session) AS BIGINT) AS n_sessions,
             count(*) AS n_events
      FROM seq GROUP BY user_id)
    SELECT CAST(count(*) AS BIGINT) AS n_users_stream,
           CAST(count(*) AS BIGINT) AS n_users_batch,
           CAST(SUM(n_sessions) AS BIGINT) AS total_sessions,
           CAST(SUM(n_events) AS BIGINT) AS total_events,
           CAST(0 AS BIGINT) AS n_mismatch
    FROM batch
    """,
)
def stream_batch_equiv_sessionize_tws(spark, sf_dir):
    """Certificate: the UN-GATED transformWithStateInPandas sessionizer
    surface (Spark 4 typed-state API where its protobuf runtime exists;
    the row-identical applyInPandasWithState twin where it doesn't —
    streaming/jobs.run_sessionize_tws_or_twin_availablenow) produces
    EXACTLY the batch lag-window sessionization per user.  Whichever
    engine path runs, the certificate pins the same batch contract, so
    a TWS state/timer bug or a degraded-twin divergence is equally a
    hash red.  Update mode can emit a user several times across
    micro-batches; the max-n_events row per user is the final state
    (idempotent when the drain already finalized)."""
    from processo_etl_spark.plans.events import sessionize_gap
    from processo_etl_spark.streaming import jobs

    raw = jobs.run_sessionize_tws_or_twin_availablenow(spark, sf_dir)
    w = Window.partitionBy("user_id").orderBy(F.desc("n_events"))
    stream = (
        raw.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .select(
            "user_id",
            F.col("n_sessions").alias("s_sessions"),
            F.col("n_events").alias("s_events"),
        )
    )
    batch = sessionize_gap(spark, sf_dir).select(
        "user_id",
        F.col("n_sessions").alias("b_sessions"),
        F.col("n_events").alias("b_events"),
    )
    joined = stream.join(batch, "user_id", "full_outer")
    return joined.agg(
        F.count("s_sessions").cast("bigint").alias("n_users_stream"),
        F.count("b_sessions").cast("bigint").alias("n_users_batch"),
        F.sum("b_sessions").cast("bigint").alias("total_sessions"),
        F.sum("b_events").cast("bigint").alias("total_events"),
        F.sum(
            _disagree(
                ("s_sessions", "b_sessions"), ("s_events", "b_events")
            ).cast("long")
        )
        .cast("bigint")
        .alias("n_mismatch"),
    )

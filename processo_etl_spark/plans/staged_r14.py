"""Heads BANKED for r14 — implemented + differentially tested this
round, NOT registered (the r13 registry froze at 296 when the
LOCAL_CORRECTNESS artifacts were regenerated; registering later would
leave the committed full-registry evidence short — the long-standing
freeze-then-refresh discipline).  ``STAGED`` is the activation
contract: r14 adds this module to ``_PLAN_MODULES`` and calls
``register_all()`` at the bottom, exactly like the staged_r11/r13
activations.  tools/gen_counts.py's banked-head listing derives from
this dict mechanically.

Content — the production shapes VERDICT r12 #6 named, plus the
incremental-dimension completion of W1:

**merge_upsert_orders** — MERGE INTO semantics (update-matched /
insert-not-matched) as a pure-Spark batch plan: the lake-scale
completion of S9 (reference dag.py:286–299 loads Postgres row-by-row
with an insert-if-absent guard; sources/jdbc.upsert_insert_only is
the certified set-based form — this head adds the UPDATE branch).

**cdc_apply_latest_wins** — apply a change feed (op ∈ I/U/D with a
monotonic seq) onto a snapshot: dedupe the feed to the latest change
per key, then merge with delete support.  The Delta/Iceberg
"apply-changes" shape, expressed engine-neutrally.

**quantile_drift_by_group** — per-group distribution drift read off
MERGEABLE fixed-grid histograms (the grouped application of r13's
quantile_daily_histogram_merge): per (event_type, period) integer
histograms, per-group medians from the cumulative counts, drift =
|bucket_even − bucket_odd|.  All-integer outputs.

**dim_incremental_surrogates** — surrogate-key high-watermark
dimension maintenance: existing natural keys keep their published
ids, new keys get contiguous ids above the current max.  The
incremental completion of W1 (reference dag.py:220–237 rebuilds
dimensions from scratch every run).

**bucketed_join_coloc** — shuffle-free co-located SMJ over tables
bucketed on the join key, with a structural zero-Exchange plan
certificate.  **partition_overwrite_daily** — dynamic partition
overwrite (the idempotent daily restatement), certified by reading
the table back against a raw-parquet oracle.  Together they cover
the storage-LAYOUT axis (bucketing + partitioned tables) the
registry's 296 heads exercise only at read time.

**stream_batch_equiv_cdc_upsert** — hash-graded streaming⇔batch
equivalence for the changelog → current-state materialization
(streaming/jobs.cdc_latest_state, the streaming-upsert view): the
stream-side completion of the CDC/MERGE family above, in the
stream_equiv certificate idiom.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from processo_etl_spark.plans.common import t

# MERGE fixture: the "existing snapshot" is every order strictly before
# the cutoff; the arriving batch is the o_orderkey % 7 == 0 slice with
# a re-priced payload (one IEEE add — identical on any engine).  Batch
# keys already in the snapshot exercise the UPDATE branch; post-cutoff
# batch keys exercise INSERT.
_MERGE_CUTOFF = "1999-01-01"


def _merge_fixture(spark, sf_dir):
    orders = t(spark, sf_dir, "orders")
    target = orders.filter(
        F.col("o_orderdate") < F.lit(_MERGE_CUTOFF).cast("timestamp")
    ).select("o_orderkey", "o_totalprice")
    source = orders.filter(F.col("o_orderkey") % 7 == 0).select(
        "o_orderkey",
        (F.col("o_totalprice") + F.lit(1000.0)).alias("new_price"),
    )
    return target, source


def merge_upsert_orders(spark, sf_dir):
    """MERGE INTO target USING source ON key — update-matched,
    insert-not-matched — as the broadcast-friendly two-branch plan:

    - UPDATE/KEEP branch: ``target LEFT JOIN broadcast(source)`` — the
      wide snapshot rows NEVER shuffle; a small CDC batch broadcasts
      (Delta's MERGE reads this as "rewrite only the matched files").
    - INSERT branch: ``source LEFT ANTI JOIN target(keys)`` — only the
      snapshot's narrow key column enters that shuffle, not the rows.

    This beats the naive full-outer formulation, which shuffles every
    target column at 100 TB.  Emits the merged relation with an
    ``action`` audit column (keep/update/insert) — the MERGE metrics a
    lakehouse writer reports per commit.  Reference parity: S9's
    insert-if-absent (dag.py:286–299) is the action='insert' branch;
    the update branch is the lake-scale extension."""
    target, source = _merge_fixture(spark, sf_dir)
    matched = (
        target.join(F.broadcast(source), "o_orderkey", "left")
        .select(
            F.col("o_orderkey").cast("bigint").alias("o_orderkey"),
            F.coalesce("new_price", "o_totalprice").alias("o_totalprice"),
            F.when(F.col("new_price").isNull(), F.lit("keep"))
            .otherwise(F.lit("update"))
            .alias("action"),
        )
    )
    inserts = source.join(
        target.select("o_orderkey"), "o_orderkey", "left_anti"
    ).select(
        F.col("o_orderkey").cast("bigint").alias("o_orderkey"),
        F.col("new_price").alias("o_totalprice"),
        F.lit("insert").alias("action"),
    )
    return matched.unionByName(inserts)


MERGE_UPSERT_ORACLE = f"""
    WITH target AS (
      SELECT o_orderkey, o_totalprice FROM orders
      WHERE o_orderdate < TIMESTAMP '{_MERGE_CUTOFF}'),
    src AS (
      SELECT o_orderkey, o_totalprice + 1000.0 AS new_price FROM orders
      WHERE o_orderkey % 7 = 0)
    SELECT CAST(t.o_orderkey AS BIGINT) AS o_orderkey,
           COALESCE(s.new_price, t.o_totalprice) AS o_totalprice,
           CASE WHEN s.o_orderkey IS NULL THEN 'keep' ELSE 'update' END
             AS action
    FROM target t LEFT JOIN src s ON t.o_orderkey = s.o_orderkey
    UNION ALL
    SELECT CAST(s.o_orderkey AS BIGINT) AS o_orderkey,
           s.new_price AS o_totalprice,
           'insert' AS action
    FROM src s
    WHERE NOT EXISTS (
      SELECT 1 FROM target t WHERE t.o_orderkey = s.o_orderkey)
"""


def _cdc_fixture(spark, sf_dir):
    """Deterministic change feed over the orders snapshot.

    Snapshot: keys with ``o_orderkey % 10 != 0``.  Feed (seq unique per
    key by construction, so latest-wins is deterministic):
    - seq 1 'I'  key%10==0            (arriving rows, not in snapshot)
    - seq 2 'U'  key%20==0            (a later update to an arrival)
    - seq 1 'U'  key%10!=0 ∧ key%3==0 (updates to snapshot rows)
    - seq 2 'D'  key%10!=0 ∧ key%6==0 (later deletes superseding some)
    Payload deltas are single IEEE adds (engine-identical)."""
    orders = t(spark, sf_dir, "orders")
    key = F.col("o_orderkey")
    base = orders.select("o_orderkey", "o_totalprice")
    target = base.filter(key % 10 != 0)
    feed = (
        base.filter(key % 10 == 0)
        .select(
            "o_orderkey",
            F.lit(1).alias("seq"),
            F.lit("I").alias("op"),
            F.col("o_totalprice").alias("price"),
        )
        .unionByName(
            base.filter(key % 20 == 0).select(
                "o_orderkey",
                F.lit(2).alias("seq"),
                F.lit("U").alias("op"),
                (F.col("o_totalprice") + F.lit(50.0)).alias("price"),
            )
        )
        .unionByName(
            base.filter((key % 10 != 0) & (key % 3 == 0)).select(
                "o_orderkey",
                F.lit(1).alias("seq"),
                F.lit("U").alias("op"),
                (F.col("o_totalprice") + F.lit(100.0)).alias("price"),
            )
        )
        .unionByName(
            base.filter((key % 10 != 0) & (key % 6 == 0)).select(
                "o_orderkey",
                F.lit(2).alias("seq"),
                F.lit("D").alias("op"),
                F.lit(None).cast("double").alias("price"),
            )
        )
    )
    return target, feed


def cdc_apply_latest_wins(spark, sf_dir):
    """Apply a CDC change feed onto a snapshot, latest change per key
    wins: dedupe the feed with one combinable groupBy (``max_by(op,
    seq)`` / ``max_by(price, seq)`` — seq is unique per key, so the
    pick is deterministic on any engine), then merge with delete
    support.

    Relation to the certified ``cdc_apply_changes`` (plans/events.py
    :423, the events-surface CDC fold): that head dedupes its
    changeset with a per-key ORDERED WINDOW (row_number over seq desc)
    and emits only the final snapshot.  This head covers the pieces a
    lakehouse apply-changes job adds on top: an explicit I/U/D op
    vocabulary with the apply-as-upsert convention, the per-row
    ``action`` audit column (the MERGE metrics a commit reports), and
    a WINDOW-FREE feed dedupe — ``max_by`` is a map-side-combinable
    aggregate, so the feed never sorts, which is the shape that wins
    when the day's feed is itself large.  Semantics of the apply:

    - latest op 'D' → the key is absent from the result;
    - latest op 'I'/'U' → present with the feed payload (apply-as-
      upsert: an update for an unseen key inserts — the Delta
      "applyChanges" convention);
    - keys not in the feed → snapshot row unchanged.

    Same 100 TB shape as merge_upsert_orders: the feed dedupe shuffles
    only the (small) feed; the apply is a broadcast left join on the
    snapshot plus a key-only anti join for pure arrivals — the wide
    snapshot rows never shuffle."""
    target, feed = _cdc_fixture(spark, sf_dir)
    latest = feed.groupBy("o_orderkey").agg(
        F.expr("max_by(op, seq)").alias("op"),
        F.expr("max_by(price, seq)").alias("price"),
    )
    applied = target.join(F.broadcast(latest), "o_orderkey", "left")
    kept = applied.filter(
        F.col("op").isNull() | (F.col("op") != "D")
    ).select(
        F.col("o_orderkey").cast("bigint").alias("o_orderkey"),
        F.coalesce("price", "o_totalprice").alias("o_totalprice"),
        F.when(F.col("op").isNull(), F.lit("keep"))
        .otherwise(F.lit("upsert"))
        .alias("action"),
    )
    arrivals = (
        latest.filter(F.col("op") != "D")
        .join(target.select("o_orderkey"), "o_orderkey", "left_anti")
        .select(
            F.col("o_orderkey").cast("bigint").alias("o_orderkey"),
            F.col("price").alias("o_totalprice"),
            F.lit("upsert").alias("action"),
        )
    )
    return kept.unionByName(arrivals)


CDC_APPLY_ORACLE = """
    WITH base AS (SELECT o_orderkey, o_totalprice FROM orders),
    target AS (SELECT * FROM base WHERE o_orderkey % 10 <> 0),
    feed AS (
      SELECT o_orderkey, 1 AS seq, 'I' AS op, o_totalprice AS price
      FROM base WHERE o_orderkey % 10 = 0
      UNION ALL
      SELECT o_orderkey, 2, 'U', o_totalprice + 50.0
      FROM base WHERE o_orderkey % 20 = 0
      UNION ALL
      SELECT o_orderkey, 1, 'U', o_totalprice + 100.0
      FROM base WHERE o_orderkey % 10 <> 0 AND o_orderkey % 3 = 0
      UNION ALL
      SELECT o_orderkey, 2, 'D', NULL
      FROM base WHERE o_orderkey % 10 <> 0 AND o_orderkey % 6 = 0),
    latest AS (
      SELECT o_orderkey, max_by(op, seq) AS op, max_by(price, seq) AS price
      FROM feed GROUP BY o_orderkey)
    SELECT CAST(t.o_orderkey AS BIGINT) AS o_orderkey,
           COALESCE(l.price, t.o_totalprice) AS o_totalprice,
           CASE WHEN l.op IS NULL THEN 'keep' ELSE 'upsert' END AS action
    FROM target t LEFT JOIN latest l ON t.o_orderkey = l.o_orderkey
    WHERE l.op IS NULL OR l.op <> 'D'
    UNION ALL
    SELECT CAST(l.o_orderkey AS BIGINT) AS o_orderkey,
           l.price AS o_totalprice,
           'upsert' AS action
    FROM latest l
    WHERE l.op <> 'D' AND NOT EXISTS (
      SELECT 1 FROM target t WHERE t.o_orderkey = l.o_orderkey)
"""


def quantile_drift_by_group(spark, sf_dir):
    """Per-group median drift between two periods, read entirely off
    MERGEABLE fixed-grid integer histograms — the grouped application
    of r13's quantile_daily_histogram_merge: once per-day-per-group
    histograms are banked (≤ ~5k cells each), ANY period-over-period
    grouped drift question is a merge over those summaries; raw events
    are never re-scanned.

    Grid: bucket = floor(value·10) (a single shared-input IEEE
    multiply + floor, identical on any engine).  Periods: day-of-month
    parity (deterministic, both present at every swept scale).  Median
    bucket per (event_type, period) = first bucket whose cumulative
    count reaches k = (n+1) div 2 — exact integer arithmetic
    throughout; drift = |bucket_even − bucket_odd|.

    Plan shape: one combinable groupBy on (group, period, bucket), one
    dimension-sized groupBy for totals, a PARTITIONED ordered cumsum
    over the bounded histogram relation (|groups|·2·≤5k rows — never
    the fact table), and a broadcast-sized self-join to pivot the two
    periods.  All outputs BIGINT/string."""
    from pyspark.sql import Window

    ev = t(spark, sf_dir, "events").filter(F.col("value").isNotNull())
    period = (F.dayofmonth("ts") % 2).cast("int")
    b = F.floor(F.col("value") * 10).cast("long")
    hist = ev.groupBy(
        F.col("event_type"), period.alias("period"), b.alias("b")
    ).agg(F.count(F.lit(1)).alias("cnt"))
    tot = hist.groupBy("event_type", "period").agg(
        F.sum("cnt").alias("n")
    )
    w = (
        Window.partitionBy("event_type", "period")
        .orderBy("b")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    cum = hist.select(
        "event_type", "period", "b", F.sum("cnt").over(w).alias("cum")
    )
    med = (
        cum.join(tot, ["event_type", "period"])
        .filter(F.col("cum") >= F.expr("(n + 1) div 2"))
        .groupBy("event_type", "period")
        .agg(F.min("b").alias("p50_b"), F.min("n").alias("n"))
    )
    even = med.filter(F.col("period") == 0).select(
        "event_type",
        F.col("p50_b").alias("p50_bucket_even"),
        F.col("n").alias("n_even"),
    )
    odd = med.filter(F.col("period") == 1).select(
        "event_type",
        F.col("p50_b").alias("p50_bucket_odd"),
        F.col("n").alias("n_odd"),
    )
    return even.join(odd, "event_type").select(
        "event_type",
        F.col("p50_bucket_even").cast("bigint").alias("p50_bucket_even"),
        F.col("p50_bucket_odd").cast("bigint").alias("p50_bucket_odd"),
        F.abs(F.col("p50_bucket_even") - F.col("p50_bucket_odd"))
        .cast("bigint")
        .alias("drift_buckets"),
        F.col("n_even").cast("bigint").alias("n_even"),
        F.col("n_odd").cast("bigint").alias("n_odd"),
    )


QUANTILE_DRIFT_ORACLE = """
    WITH ev AS (
      SELECT event_type,
             day(ts) % 2 AS period,
             CAST(FLOOR(value * 10) AS BIGINT) AS b
      FROM events WHERE value IS NOT NULL),
    hist AS (
      SELECT event_type, period, b, count(*) AS cnt
      FROM ev GROUP BY 1, 2, 3),
    tot AS (
      SELECT event_type, period, SUM(cnt) AS n
      FROM hist GROUP BY 1, 2),
    cum AS (
      SELECT event_type, period, b,
             SUM(cnt) OVER (PARTITION BY event_type, period ORDER BY b
                            ROWS UNBOUNDED PRECEDING) AS cum
      FROM hist),
    med AS (
      SELECT c.event_type, c.period, MIN(c.b) AS p50_b, MIN(t.n) AS n
      FROM cum c JOIN tot t USING (event_type, period)
      WHERE c.cum >= (t.n + 1) // 2
      GROUP BY 1, 2)
    SELECT e.event_type,
           CAST(e.p50_b AS BIGINT) AS p50_bucket_even,
           CAST(o.p50_b AS BIGINT) AS p50_bucket_odd,
           CAST(ABS(e.p50_b - o.p50_b) AS BIGINT) AS drift_buckets,
           CAST(e.n AS BIGINT) AS n_even,
           CAST(o.n AS BIGINT) AS n_odd
    FROM (SELECT * FROM med WHERE period = 0) e
    JOIN (SELECT * FROM med WHERE period = 1) o USING (event_type)
"""


def dim_incremental_surrogates(spark, sf_dir):
    """Incremental dimension maintenance with a surrogate-key high
    watermark — the production warehouse pattern the one-shot W1
    builds (operators/star.build_dimension*, reference dag.py:220–237)
    don't cover: when a new batch arrives, EXISTING natural keys keep
    their already-published surrogate ids (downstream facts reference
    them — reassignment corrupts history), and only never-seen keys
    get new ids, assigned contiguously ABOVE the current max
    (deterministically: sorted among the new keys).

    Fixture: the established dimension is (p_brand, p_type, p_size)
    from parts with ``p_partkey % 4 != 0`` (ids 1..N by sorted natural
    key, the certified build_dimension); the arriving batch is the
    % 4 == 0 slice, which carries both already-known combos (no-ops)
    and genuinely new ones (50 at sf0.001, 384 at sf0.01, 517 at
    sf0.1 — verified against the parquet).

    Plan shape: one collect_set dimension build per side (the shuffle
    payload is the distinct domain itself), a key-only anti join to
    isolate new keys, and a broadcast one-row count attach for the
    watermark offset — the fact table never appears.  At 100 TB the
    existing dim is a stored table, so the whole job touches only the
    batch's distinct keys + the dim.  Activation note: the one-row
    watermark attach is a broadcast nested-loop — add this name to
    test_scale.allow_nested_loop (the q11/DSIR scalar-attach class)."""
    from processo_etl_spark.operators import star

    keys = ["p_brand", "p_type", "p_size"]
    part = t(spark, sf_dir, "part")
    old = part.filter(F.col("p_partkey") % 4 != 0)
    arrivals = part.filter(F.col("p_partkey") % 4 == 0)
    existing = star.build_dimension(old, keys, "dim_id")
    new_keys = (
        arrivals.select(*keys)
        .distinct()
        .join(existing.select(*keys), keys, "left_anti")
    )
    new_ranked = star.build_dimension(new_keys, keys, "rank")
    watermark = existing.agg(F.count(F.lit(1)).cast("long").alias("__n"))
    new_rows = new_ranked.crossJoin(F.broadcast(watermark)).select(
        *keys,
        (F.col("rank") + F.col("__n")).cast("bigint").alias("dim_id"),
        F.lit("new").alias("status"),
    )
    old_rows = existing.select(
        *keys,
        F.col("dim_id").cast("bigint").alias("dim_id"),
        F.lit("existing").alias("status"),
    )
    return old_rows.unionByName(new_rows)


DIM_INCREMENTAL_ORACLE = """
    WITH oldk AS (
      SELECT DISTINCT p_brand, p_type, p_size FROM part
      WHERE p_partkey % 4 <> 0),
    newk AS (
      SELECT DISTINCT p_brand, p_type, p_size FROM part
      WHERE p_partkey % 4 = 0
      EXCEPT
      SELECT p_brand, p_type, p_size FROM oldk)
    SELECT p_brand, p_type, p_size,
           CAST(row_number() OVER (ORDER BY p_brand, p_type, p_size)
             AS BIGINT) AS dim_id,
           'existing' AS status
    FROM oldk
    UNION ALL
    SELECT p_brand, p_type, p_size,
           CAST((SELECT count(*) FROM oldk)
             + row_number() OVER (ORDER BY p_brand, p_type, p_size)
             AS BIGINT) AS dim_id,
           'new' AS status
    FROM newk
"""


def _sf_tag(sf_dir: str) -> str:
    """Identifier-safe table-name tag for an sf_dir — the ONE
    definition shared by both table-writing heads and their tests
    (divergent copies would break _reset_table cleanup and the
    hardcoded names in tests/test_staged_r14.py)."""
    import re

    return re.sub(r"[^0-9A-Za-z]", "_", sf_dir.rstrip("/").rsplit("/", 1)[-1])


def _reset_table(spark, name: str) -> None:
    """Drop a managed table AND its warehouse directory.  A fresh
    session's in-memory catalog has no memory of tables a previous
    session wrote, but their warehouse directories persist — a bare
    saveAsTable then fails with LOCATION_ALREADY_EXISTS.  Dropping via
    SQL handles the registered case; removing the leftover directory
    handles the cross-session one."""
    import shutil

    spark.sql(f"DROP TABLE IF EXISTS {name}")
    wh = spark.conf.get(
        "spark.sql.warehouse.dir", "spark-warehouse"
    ).removeprefix("file:")
    shutil.rmtree(f"{wh}/{name}", ignore_errors=True)


def bucketed_join_coloc(spark, sf_dir):
    """Shuffle-free co-located join via TABLE BUCKETING — the storage-
    layout capability SURVEY §"beyond" names (bucketing) that no
    registered head demonstrated: both join sides are written as
    parquet tables bucketed 8 ways on the join key (``bucketBy`` +
    ``sortBy``), and the sort-merge join over them plans with ZERO
    Exchange operators — the scan's bucket layout satisfies the join's
    distribution requirement, so at 100 TB the nightly fact↔fact join
    pays no shuffle at all (this is the pre-shuffled-layout pattern:
    shuffle once at write time, join free forever after).

    The plan certificate is structural, not timed: the head inspects
    the JOIN subtree's physical plan STRING at build (a JVM call, no
    job) and emits ``join_shuffle_free`` — true only when no Exchange
    appears under the SortMergeJoin.  ``hint("merge")`` pins SMJ so a
    small-scale broadcast pick cannot fake the certificate.  Rows are
    the per-priority revenue rollup (decimal-internal, double out —
    the q1 convention), so the numeric outputs grade against the
    plain-parquet oracle while the boolean grades the layout claim.

    Activation note: table writes run at plan build (the
    multimodal_binary_ingest corpus-write precedent) — add to
    grading.EAGER_AT_BUILD so schema-only sweeps skip it."""
    tag = _sf_tag(sf_dir)
    t_orders, t_li = f"bkt_orders_{tag}", f"bkt_lineitem_{tag}"
    _reset_table(spark, t_orders)
    _reset_table(spark, t_li)
    t(spark, sf_dir, "orders").select("o_orderkey", "o_orderpriority").write.format(
        "parquet"
    ).mode("overwrite").bucketBy(8, "o_orderkey").sortBy("o_orderkey").saveAsTable(
        t_orders
    )
    t(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_extendedprice"
    ).write.format("parquet").mode("overwrite").bucketBy(8, "l_orderkey").sortBy(
        "l_orderkey"
    ).saveAsTable(t_li)
    from processo_etl_spark.plans.common import dsum

    o = spark.table(t_orders).hint("merge")
    li = spark.table(t_li).hint("merge")
    joined = li.join(o, li.l_orderkey == o.o_orderkey)
    plan = joined._jdf.queryExecution().executedPlan().toString()
    shuffle_free = "Exchange" not in plan
    return (
        joined.groupBy("o_orderpriority")
        .agg(
            dsum("l_extendedprice").alias("sum_price"),
            F.count(F.lit(1)).cast("bigint").alias("n_items"),
        )
        .withColumn("join_shuffle_free", F.lit(bool(shuffle_free)))
    )


BUCKETED_JOIN_ORACLE = """
    SELECT o.o_orderpriority,
           CAST(SUM(CAST(ROUND(l.l_extendedprice, 2) AS DECIMAL(12,2)))
             AS DOUBLE) AS sum_price,
           CAST(count(*) AS BIGINT) AS n_items,
           true AS join_shuffle_free
    FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
    GROUP BY o.o_orderpriority
"""


def partition_overwrite_daily(spark, sf_dir):
    """Dynamic partition overwrite — the lake daily-restatement
    pattern: a date-partitioned table takes a corrected batch for a
    SUBSET of days, and mode("overwrite") under
    ``spark.sql.sources.partitionOverwriteMode=dynamic`` replaces ONLY
    the partitions present in the batch; every untouched day's data
    survives byte-for-byte.  (Static overwrite — the default — drops
    the whole table: the prototype run for this head measured exactly
    that failure, 30 days → 10.)

    Fixture: events partitioned by day; the restated batch is days
    1–10 with ``value`` doubled (×2 is a power-of-two multiply —
    bit-exact on any engine).  The head then reads the TABLE back and
    emits per-day counts + decimal-exact value sums, so the grade
    against the raw-parquet oracle (which computes what the table
    SHOULD contain) certifies both halves: restated days carry the
    doubled values, untouched days carry the originals — neither
    survives a wrong overwrite scope.

    At 100 TB this is the idempotent daily reload: re-running a day's
    job replaces that day exactly, no read-modify-write of the table,
    no touching the other ~3650 partitions.  Activation note: add to
    grading.EAGER_AT_BUILD (table writes at plan build)."""
    tag = _sf_tag(sf_dir)
    tbl = f"evt_restate_{tag}"
    _reset_table(spark, tbl)
    ev = t(spark, sf_dir, "events").select(
        "event_id", "event_type", "value", F.to_date("ts").alias("day")
    )
    ev.write.format("parquet").mode("overwrite").partitionBy("day").saveAsTable(
        tbl
    )
    batch = ev.filter(F.dayofmonth("day") <= 10).withColumn(
        "value", F.col("value") * 2
    )
    prev = spark.conf.get("spark.sql.sources.partitionOverwriteMode", "STATIC")
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    try:
        batch.select("event_id", "event_type", "value", "day").write.mode(
            "overwrite"
        ).insertInto(tbl)
    finally:
        spark.conf.set("spark.sql.sources.partitionOverwriteMode", prev)
    from processo_etl_spark.plans.common import dsum

    return (
        spark.table(tbl)
        .groupBy("day")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n"),
            dsum("value").alias("sum_value"),
        )
    )


PARTITION_OVERWRITE_ORACLE = """
    SELECT CAST(ts AS DATE) AS day,
           CAST(count(*) AS BIGINT) AS n,
           CAST(SUM(CAST(ROUND(
             CASE WHEN day(CAST(ts AS DATE)) <= 10 THEN value * 2
                  ELSE value END, 2) AS DECIMAL(12,2))) AS DOUBLE)
             AS sum_value
    FROM events
    GROUP BY 1
"""


def stream_batch_equiv_cdc_upsert(spark, sf_dir):
    """Streaming ⇔ batch equivalence certificate for the changelog →
    current-state materialization (streaming/jobs.cdc_latest_state —
    the streaming-upsert view, the stream-side completion of this
    module's CDC/MERGE family): drain the REAL streaming job
    (complete-mode aggregate, availableNow) AND fold the same
    changelog batch-side, full-outer-join the two per-key views, and
    count disagreements null-safely (the stream_equiv convention —
    a one-sided NULL bumps n_mismatch).  A lost micro-batch, a
    replay-duplicated fold, or a tombstone that failed to delete all
    move a per-key value or count and the driver hash goes red.

    The oracle replays the batch semantics in SQL via row_number over
    seq DESC (seq is unique per key, so the window pick, the struct
    max, and the streaming fold must all agree); value is a raw
    parquet passthrough on every path — no float arithmetic."""
    from processo_etl_spark.streaming import jobs

    stream = jobs.run_cdc_latest_state_availablenow(spark, sf_dir).select(
        "user_id",
        F.lit(1).alias("s_present"),
        F.col("value").alias("s_value"),
    )
    batch = (
        jobs.cdc_latest_state(
            jobs.cdc_changes_from_events(t(spark, sf_dir, "events"))
        )
        .filter(F.col("op") != "D")
        .select(
            "user_id",
            F.lit(1).alias("b_present"),
            F.col("value").alias("b_value"),
        )
    )
    joined = stream.join(batch, "user_id", "full_outer")
    # key presence is counted via literal markers, NOT the value
    # column: count("s_value") would drop a live key whose latest
    # payload is legitimately NULL from the key counts while the
    # oracle's count(*) kept it (review r13).  The disagreement
    # predicate covers both presence (one-sided-NULL marker) and the
    # payload value, null-safely.
    disagree = ~F.col("s_present").eqNullSafe(F.col("b_present")) | ~F.col(
        "s_value"
    ).eqNullSafe(F.col("b_value"))
    return joined.agg(
        F.count("s_present").cast("bigint").alias("n_keys_stream"),
        F.count("b_present").cast("bigint").alias("n_keys_batch"),
        F.sum(F.col("b_value").isNotNull().cast("long"))
        .cast("bigint")
        .alias("n_nonnull_values"),
        F.sum(disagree.cast("long")).cast("bigint").alias("n_mismatch"),
    )


STREAM_CDC_UPSERT_ORACLE = """
    WITH ranked AS (
      SELECT user_id,
             CASE WHEN event_type = 'error' THEN 'D' ELSE 'U' END AS op,
             value,
             row_number() OVER (PARTITION BY user_id
                                ORDER BY event_id DESC) AS rn
      FROM events),
    cur AS (
      SELECT user_id, value FROM ranked WHERE rn = 1 AND op <> 'D')
    SELECT CAST(count(*) AS BIGINT) AS n_keys_stream,
           CAST(count(*) AS BIGINT) AS n_keys_batch,
           CAST(SUM(CAST(value IS NOT NULL AS INTEGER)) AS BIGINT)
             AS n_nonnull_values,
           CAST(0 AS BIGINT) AS n_mismatch
    FROM cur
"""


STAGED = {
    "merge_upsert_orders": (merge_upsert_orders, MERGE_UPSERT_ORACLE),
    "stream_batch_equiv_cdc_upsert": (
        stream_batch_equiv_cdc_upsert,
        STREAM_CDC_UPSERT_ORACLE,
    ),
    "bucketed_join_coloc": (bucketed_join_coloc, BUCKETED_JOIN_ORACLE),
    "partition_overwrite_daily": (
        partition_overwrite_daily,
        PARTITION_OVERWRITE_ORACLE,
    ),
    "dim_incremental_surrogates": (
        dim_incremental_surrogates,
        DIM_INCREMENTAL_ORACLE,
    ),
    "cdc_apply_latest_wins": (cdc_apply_latest_wins, CDC_APPLY_ORACLE),
    "quantile_drift_by_group": (
        quantile_drift_by_group,
        QUANTILE_DRIFT_ORACLE,
    ),
}


def register_all() -> None:
    """r14 activation hook: add this module to ``_PLAN_MODULES`` and
    call this at module bottom (do NOT call it twice — register()
    raises on duplicate names).  NOT called in r13: the heads are
    banked to keep the refreshed full-registry artifacts exact.
    Activation checklist beyond the registration flip:
    - add ``dim_incremental_surrogates`` to
      test_scale.allow_nested_loop (one-row broadcast watermark
      attach — the q11/DSIR scalar-attach class);
    - add ``bucketed_join_coloc`` and ``partition_overwrite_daily``
      to grading.EAGER_AT_BUILD (table writes run at plan build —
      the multimodal_binary_ingest corpus-write precedent);
    - the remaining heads need nothing: lazy plans, no global
      window (quantile_drift_by_group's cumsum window is PARTITIONED
      by (event_type, period)), no nested-loop attach;
      stream_batch_equiv_cdc_upsert drains at call time like every
      stream_* head and is skipped by schema-only sweeps via the
      existing stream_ prefix rule."""
    from processo_etl_spark.plans import register

    for name, (fn, oracle) in STAGED.items():
        register(name, oracle)(fn)

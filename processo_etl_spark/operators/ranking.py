"""Distributed global ranking — exact rank/ntile without the
single-partition ``Window.orderBy(...)`` anti-pattern.

``ntile(k) OVER (ORDER BY …)`` (and any unpartitioned ranking window)
moves the ENTIRE input through one task — the classic scale-killer
(``WindowExec: No Partition Defined``).  The exact semantics survive at
100 TB with the classic two-phase plan:

1. range-repartition on the order key (Spark samples boundaries, so
   partitions are balanced) and rank LOCALLY per partition — the window
   partitions by ``spark_partition_id()``, so no data moves again;
2. collect only the per-partition COUNTS (one tiny row per partition),
   prefix-sum them on the driver, and add the offsets back via a
   broadcast literal map.

``global_rank = partition_offset + local_row_number`` reproduces
``row_number() OVER (ORDER BY …)`` bit-for-bit; ``ntile_from_rank``
applies SQL NTILE's first-buckets-get-the-remainder fill to that rank.
The only driver-side data is one long per shuffle partition — the same
legitimate two-pass shape as the histogram min/max probe (quality/audit).
"""

from __future__ import annotations

import math

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def _ranked_with_total(
    df: DataFrame,
    order_by: list[str | Column],
    rank_col: str,
    num_partitions: int | None,
) -> tuple[DataFrame, int]:
    """Range-partitioned exact global rank + total row count (one tiny
    counts job; the ranked frame itself stays lazy/distributed)."""
    cols = [F.col(c) if isinstance(c, str) else c for c in order_by]
    parts = num_partitions or int(
        df.sparkSession.conf.get("spark.sql.shuffle.partitions", "32")
    )
    # Persist the ranged frame: the counts probe and the downstream
    # consumer then share one range shuffle.  (Measured: persisting the
    # INPUT instead is ~45% slower — it blocks Spark's shuffle reuse
    # between the boundary-sampling job and the main pass, which already
    # deduplicates the upstream computation.)
    ranged = df.repartitionByRange(int(parts), *cols).withColumn(
        "__pid", F.spark_partition_id()
    ).persist()
    # Tiny job: one row per partition → prefix sums on the driver.
    counts = {
        r["__pid"]: r["n"]
        for r in ranged.groupBy("__pid").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    offsets, acc = {}, 0
    for pid in sorted(counts):
        offsets[pid] = acc
        acc += counts[pid]
    # Local rank inside each range partition: the window partitions by
    # __pid, so WindowExec sees per-partition data — no global exchange.
    w = Window.partitionBy("__pid").orderBy(*cols)
    # Broadcast the offsets as a literal map — no join, stays narrow.
    # Empty-input edge: a literal map() is VOID-keyed and map()[int]
    # fails analysis — with no partitions every offset is 0.
    offset_map = (
        F.create_map(
            *[F.lit(x) for pid in sorted(offsets) for x in (pid, offsets[pid])]
        )[F.col("__pid")]
        if offsets
        else F.lit(None).cast("long")
    )
    ranked = ranged.withColumn(
        rank_col,
        (F.coalesce(offset_map, F.lit(0)) + F.row_number().over(w)).cast("long"),
    ).drop("__pid")
    return ranked, acc


def distributed_rank(
    df: DataFrame,
    order_by: list[str | Column],
    out_col: str = "global_rank",
    num_partitions: int | None = None,
) -> DataFrame:
    """Exact global ``row_number() OVER (ORDER BY order_by)`` — distributed.

    Range-partition + local rank + broadcast prefix-sum offsets (two
    jobs, no single-partition exchange).  ``order_by`` must be a total
    order (append a unique tiebreaker column) for deterministic output.
    """
    ranked, _ = _ranked_with_total(df, order_by, out_col, num_partitions)
    return ranked


def ntile_from_rank(rank: Column, n_rows: int, k: int) -> Column:
    """SQL NTILE(k) bucket for a 1-based global rank over ``n_rows``.

    NTILE fills the remainder into the FIRST buckets: with q = n div k
    and rem = n mod k, buckets 1..rem hold q+1 rows, the rest q.
    """
    q, rem = divmod(n_rows, k)
    if q == 0:  # fewer rows than buckets: bucket = rank
        return rank.cast("int")
    big = rem * (q + 1)  # rows covered by the (q+1)-sized buckets
    in_big = F.ceil(rank / F.lit(q + 1))
    in_small = F.lit(rem) + F.ceil((rank - F.lit(big)) / F.lit(q))
    return F.when(rank <= F.lit(big), in_big).otherwise(in_small).cast("int")


def distributed_ntile(
    df: DataFrame,
    order_by: list[str | Column],
    k: int,
    out_col: str = "bucket",
    num_partitions: int | None = None,
) -> DataFrame:
    """Exact ``NTILE(k) OVER (ORDER BY order_by)`` without a global window.

    Same two-phase rank as :func:`distributed_rank`; the total row count
    the bucket formula needs falls out of the same per-partition counts
    job, so no extra pass over the data."""
    ranked, n_rows = _ranked_with_total(df, order_by, "__grank", num_partitions)
    return ranked.withColumn(
        out_col, ntile_from_rank(F.col("__grank"), n_rows, k)
    ).drop("__grank")


def exact_quantiles_twopass(
    df: DataFrame,
    col: str,
    qs: list[float],
    accuracy: int = 10_000,
) -> list[tuple[float, int, float]]:
    """EXACT type-1 quantiles (k-th smallest, k = ceil(q·n)) at scale:
    approx-bracket then refine — never a global sort, never a per-group
    ``percentile`` buffer (Spark's exact ``percentile`` collects every
    value into one aggregation buffer; ``functions/cleaning.exact_median``
    documents that as its 100 TB deviation — this is the path that
    removes the deviation).

    Three tiny jobs, each map-side combinable:

    1. ``n`` + ``percentile_approx(col, q ± 2ε, accuracy)`` — the
       sketch's rank error is ≤ ε·n (ε = 1/accuracy), so the bracket
       [lo, hi] provably contains the exact order statistic;
    2. per-q anchor ``count(col < lo)`` — absolute rank of the bracket
       floor;
    3. value-histogram of the bracket union (groupBy value): ≤ ~4εn
       rows per q BEFORE duplicate collapse, so the driver holds at
       most 4·|qs|·n/accuracy value-count pairs (~24 per q at n=60k,
       accuracy=1e4).  Size the budget by choosing accuracy ≈ 4n/B for
       a driver budget of B rows.

    The returned value is an actual datum (no interpolation), so any
    engine replaying "k-th smallest" agrees bit-for-bit; ties collapse
    into one histogram row and the cumulative walk lands on the same
    value regardless of tie order.  Returns [(q, k, value), …].
    """
    c = F.col(col)
    eps = 1.0 / accuracy
    src = df.filter(c.isNotNull())
    lo_qs = [max(0.0, q - 2 * eps) for q in qs]
    hi_qs = [min(1.0, q + 2 * eps) for q in qs]
    probe = src.agg(
        F.count(c).alias("n"),
        F.percentile_approx(c, lo_qs, accuracy).alias("lo"),
        F.percentile_approx(c, hi_qs, accuracy).alias("hi"),
    ).first()
    n, los, his = probe["n"], probe["lo"], probe["hi"]
    if n == 0:
        return [(q, 0, float("nan")) for q in qs]
    anchors = src.agg(
        *[
            F.sum((c < F.lit(lo)).cast("long")).alias(f"a{i}")
            for i, lo in enumerate(los)
        ]
    ).first()
    in_any = None
    for lo, hi in zip(los, his):
        cond = (c >= F.lit(lo)) & (c <= F.lit(hi))
        in_any = cond if in_any is None else (in_any | cond)
    hist = sorted(
        (r["v"], r["cnt"])
        for r in src.filter(in_any)
        .groupBy(c.alias("v"))
        .agg(F.count(F.lit(1)).alias("cnt"))
        .collect()
    )
    out = []
    for q, lo, anchor in zip(qs, los, [anchors[f"a{i}"] for i in range(len(qs))]):
        k = max(1, math.ceil(q * n))
        need = k - anchor  # rank within [lo, hi] (positive by the ε bound)
        cum = 0
        value = None
        for v, cnt in hist:
            if v < lo:
                continue
            cum += cnt
            if cum >= need:
                value = v
                break
        if value is None:  # ε bound violated (cannot happen per sketch contract)
            raise RuntimeError(f"quantile bracket missed q={q}; raise accuracy")
        out.append((q, k, float(value)))
    return out


def grouped_exact_quantiles(
    df: DataFrame,
    group_col: str,
    col: str,
    qs: list[float],
    accuracy: int = 10_000,
) -> DataFrame:
    """EXACT type-1 quantiles PER GROUP, fully distributed — the grouped
    form of ``exact_quantiles_twopass`` with the driver removed from the
    refinement: Spark's exact ``percentile`` buffers every value of a
    group in one aggregation buffer, while this plan's per-task state is
    bounded by the sketch's bracket width regardless of group size.

    1. bracket agg: per group, ``n`` + ``percentile_approx(col, q ± 2ε,
       accuracy)`` (combinable sketch; rank error ≤ ε·n_g pins the
       bracket);
    2. ONE tagged pass over the data joined to the broadcast bracket
       table (|groups|·|qs| rows): rows below the bracket count into
       the rank anchor, rows inside it into a per-(group, q, value)
       histogram, rows above are dropped BEFORE the shuffle — a
       combinable groupBy whose key space is bracket-sized;
    3. a cumulative window over each (group, q)'s ≤ ~4ε·n_g histogram
       rows picks the first value whose cumulative count reaches
       k − anchor.  The window partition is bracket-sized by
       construction — never group-sized.

    Output: (group, q, k, value); values are actual data (no
    interpolation), so sort-based oracles agree bit-for-bit.
    """
    g = F.col(group_col)
    c = F.col(col)
    eps = 1.0 / accuracy
    lo_qs = [max(0.0, q - 2 * eps) for q in qs]
    hi_qs = [min(1.0, q + 2 * eps) for q in qs]
    src = df.filter(c.isNotNull()).select(g.alias("g"), c.alias("x"))
    br = src.groupBy("g").agg(
        F.count(F.lit(1)).alias("n"),
        F.percentile_approx("x", lo_qs, accuracy).alias("los"),
        F.percentile_approx("x", hi_qs, accuracy).alias("his"),
    )
    brx = br.select(
        "g",
        "n",
        F.explode(
            F.arrays_zip(
                F.array(*[F.lit(q) for q in qs]).alias("q"),
                F.col("los").alias("lo"),
                F.col("his").alias("hi"),
            )
        ).alias("z"),
    ).select(
        "g",
        F.col("z.q").alias("q"),
        F.col("z.lo").alias("lo"),
        F.col("z.hi").alias("hi"),
        F.greatest(
            F.lit(1).cast("long"),
            F.ceil(F.col("z.q") * F.col("n").cast("double")),
        ).alias("k"),
    )
    tagged = (
        src.join(F.broadcast(brx), "g")
        .filter(F.col("x") <= F.col("hi"))
        .select(
            "g",
            "q",
            "k",
            F.when(F.col("x") >= F.col("lo"), F.col("x")).alias("v"),
        )
    )
    hist = tagged.groupBy("g", "q", "k", "v").agg(
        F.count(F.lit(1)).alias("cnt")
    )
    anchors = (
        hist.filter(F.col("v").isNull())
        .select("g", "q", F.col("cnt").alias("anchor"))
    )
    w = (
        Window.partitionBy("g", "q")
        .orderBy("v")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    walked = (
        hist.filter(F.col("v").isNotNull())
        .join(F.broadcast(anchors), ["g", "q"], "left")
        .withColumn("cum", F.sum("cnt").over(w))
        .filter(
            F.col("cum") >= F.col("k") - F.coalesce("anchor", F.lit(0))
        )
    )
    pick = Window.partitionBy("g", "q").orderBy("v")
    picked = (
        walked.withColumn("__rn", F.row_number().over(pick))
        .filter(F.col("__rn") == 1)
        .select("g", "q", "k", F.col("v").alias("value"))
    )
    # Loud bracket-violation check (ADVICE r4): the ungrouped twin
    # exact_quantiles_twopass raises RuntimeError when the sketch bracket
    # misses; here a miss would silently DROP the (group, q) row.  Every
    # (g, q) in the bracket spec must produce a pick (k ≥ 1 and groups
    # have ≥ 1 non-null row by construction), so re-attach the spec and
    # raise at execution time — lazily, no extra driver job — if any
    # spec row comes back pickless.
    spec = brx.select("g", "q", "k")
    guarded = F.when(
        F.col("value").isNull(),
        F.raise_error(
            F.concat(
                F.lit(
                    "grouped_exact_quantiles: sketch bracket produced no "
                    "pick for group="
                ),
                F.col("g").cast("string"),
                F.lit(" q="),
                F.col("q").cast("string"),
            )
        ),
    ).otherwise(F.col("value"))
    return spec.join(picked, ["g", "q", "k"], "left").select(
        F.col("g").alias(group_col),
        "q",
        "k",
        guarded.alias("value"),
    )


def skyline_2d(df: DataFrame, x_col: str, y_col: str) -> DataFrame:
    """2-D skyline (Pareto frontier), both criteria MINIMIZED: rows no
    other row strictly dominates (other.x ≤ x AND other.y ≤ y with at
    least one strict) — Börzsönyi/Kossmann/Stocker's SKYLINE OF
    operator, the "best trade-offs" query (cheapest-vs-smallest,
    price-vs-latency).  To maximize a criterion, pass its negation.

    The naive formulation is a NOT EXISTS theta self-join — O(n²) and
    unshardable.  In 2-D the skyline is exactly the rows where y
    strictly undercuts the running min of y over all smaller x, so the
    plan is the sort-based O(n log n) form, distributed with the same
    range-partition + driver-prefix trick as ``distributed_rank``:

    1. combinable groupBy x → min(y) (collapses the row count to
       |distinct x| BEFORE any ordering work);
    2. range-repartition on x; per-partition strict-prefix running min
       (window partitioned BY the range partition — no global
       exchange); one tiny per-partition-min collect gives each
       partition the min over all PRIOR partitions as a broadcast
       literal;
    3. keep x-groups whose min(y) beats the combined strict prefix;
       join back to the input on (x, y = min(y)) — same-x rows above
       the group min are dominated within the group.

    Ties: equal (x, y) duplicates dominate each other only weakly, so
    all stay — matching the strict-dominance NOT EXISTS definition.
    """
    x, y = F.col(x_col), F.col(y_col)
    # NULL criteria have no dominance semantics — and a NULL x group
    # would sort first and poison the prefix min.  Excluded up front.
    df = df.filter(x.isNotNull() & y.isNotNull())
    g = df.groupBy(x.alias("__x")).agg(F.min(y).alias("__miny"))
    parts = int(
        df.sparkSession.conf.get("spark.sql.shuffle.partitions", "32")
    )
    ranged = (
        g.repartitionByRange(parts, F.col("__x"))
        .withColumn("__pid", F.spark_partition_id())
        .persist()
    )
    pmins = {
        r["__pid"]: r["m"]
        for r in ranged.groupBy("__pid").agg(F.min("__miny").alias("m")).collect()
    }
    prior: dict[int, float] = {}
    best = None
    for pid in sorted(pmins):
        if best is not None:
            prior[pid] = best
        best = pmins[pid] if best is None else min(best, pmins[pid])
    # An empty literal map is VOID-keyed and map()[int] fails analysis —
    # when no partition has a predecessor (≤1 non-empty partition), the
    # prior-min is simply NULL everywhere.
    prior_map = (
        F.create_map(*[F.lit(v) for pid in prior for v in (pid, prior[pid])])[
            F.col("__pid")
        ]
        if prior
        else F.lit(None).cast("double")
    )
    w = (
        Window.partitionBy("__pid")
        .orderBy("__x")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    prefix = F.least(
        F.min("__miny").over(w), prior_map
    )  # least() ignores NULLs; NULL prefix = no smaller x anywhere
    sky = (
        ranged.withColumn("__prefix", prefix)
        .filter(F.col("__prefix").isNull() | (F.col("__miny") < F.col("__prefix")))
        .select("__x", "__miny")
    )
    return df.join(
        sky, (x == F.col("__x")) & (y == F.col("__miny"))
    ).drop("__x", "__miny")


def grouped_topk(
    df: DataFrame,
    group_cols: list[str],
    order_by: list[Column],
    k: int,
    rank_col: str = "rk",
    salt_key: str | Column | None = None,
    salt_buckets: int = 64,
) -> DataFrame:
    """Top-k per group with BOUNDED task state — the scale twin of
    ``row_number() OVER (PARTITION BY group) <= k``: a plain grouped
    window sorts each group in one task, so one celebrity group stalls
    the stage and can spill unboundedly.  Here stage 1 ranks within
    (group, salt) — per-task sort state is |group|/salt_buckets however
    skewed the groups — and keeps ranks ≤ k; stage 2 ranks the
    ≤ salt_buckets·k survivors per group.  A row outside its salt's
    top-k is dominated by k same-group rows, so the two-stage result
    EQUALS the single-window top-k (same argument as
    ml/splits.weighted_sample_aes, which inlines this shape).

    ``order_by`` must be a total order (append a unique tiebreaker);
    ``salt_key`` defaults to the hash of ALL columns' string forms
    (order_by entries may be SortOrder expressions — ``F.desc(c)`` —
    which cannot be re-evaluated as values, so the default never
    touches them).  Pass the row key explicitly when a cheaper or
    stabler salt exists; a salt CONSTANT within a group would put the
    whole group in one bucket and restore the skew."""
    from processo_etl_spark.ml.dedup import md5_long

    if salt_key is not None:
        skc = (
            F.col(salt_key) if isinstance(salt_key, str) else salt_key
        ).cast("string")
    else:
        skc = F.concat_ws(
            "\x1f", *[F.col(c).cast("string") for c in df.columns]
        )
    salt = md5_long(F.concat(F.lit("topk:"), skc)) % F.lit(salt_buckets)
    w1 = Window.partitionBy(*group_cols, "__salt").orderBy(*order_by)
    survivors = (
        df.withColumn("__salt", salt)
        .withColumn("__r1", F.row_number().over(w1))
        .filter(F.col("__r1") <= k)
        .drop("__r1", "__salt")
    )
    w2 = Window.partitionBy(*group_cols).orderBy(*order_by)
    return survivors.withColumn(
        rank_col, F.row_number().over(w2).cast("int")
    ).filter(F.col(rank_col) <= k)


def distributed_cumsum(
    df: DataFrame,
    order_by: list[str | Column],
    value_col: str,
    out_col: str = "cumsum",
    num_partitions: int | None = None,
) -> DataFrame:
    """Exact global ``SUM(value) OVER (ORDER BY …)`` — distributed, the
    running-sum sibling of :func:`distributed_rank`: range-partition on
    the order key, per-partition local running sums, and each
    partition's prior-partition TOTAL added back as a broadcast literal
    (one tiny per-partition-totals job).  No single-partition window
    anywhere.

    Exactness: integer/decimal values sum associatively, so the split
    is value-identical to the global window; for doubles the
    re-association can differ in the last ulps — keep the value column
    integral (the sweep-line use case: +1/−1 deltas).  Rows tied on the
    full ``order_by`` receive order-dependent INTERMEDIATE sums (any
    window does this); aggregate consumers (max/min of the running sum)
    are tie-safe when ties share a sign, as in the concurrency sweep.
    """
    cols = [F.col(c) if isinstance(c, str) else c for c in order_by]
    parts = num_partitions or int(
        df.sparkSession.conf.get("spark.sql.shuffle.partitions", "32")
    )
    ranged = (
        df.repartitionByRange(int(parts), *cols)
        .withColumn("__pid", F.spark_partition_id())
        .persist()
    )
    totals = {
        r["__pid"]: r["s"]
        for r in ranged.groupBy("__pid")
        .agg(F.sum(value_col).alias("s"))
        .collect()
    }
    prior: dict[int, int] = {}
    acc = 0
    for pid in sorted(totals):
        prior[pid] = acc
        acc += totals[pid] or 0
    offset = (
        F.create_map(
            *[F.lit(x) for pid in prior for x in (pid, prior[pid])]
        )[F.col("__pid")]
        if prior
        else F.lit(None).cast("long")
    )
    w = (
        Window.partitionBy("__pid")
        .orderBy(*cols)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return ranged.withColumn(
        out_col,
        F.coalesce(offset, F.lit(0)) + F.sum(value_col).over(w),
    ).drop("__pid")

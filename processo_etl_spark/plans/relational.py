"""Relational-core plans: projections, filters, joins, dedup, unions,
sorts, top-k (SURVEY.md §2.2–§2.4, §2.7) — each with a DuckDB oracle.

Query-shape correspondences onto the driver testdata per FIXTURES.md:
``lineitem`` plays the fact-grain table, ``part``/``orders`` the joined
detail tables, ``orders→customer→nation→region`` the star joins.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from processo_etl_spark.functions import cleaning
from processo_etl_spark.operators import relational as R
from processo_etl_spark.plans import register
from processo_etl_spark.plans.common import dec, t


# --- P1-P4: projection ------------------------------------------------------
@register(
    "projection",
    oracle="""
    SELECT l_orderkey, l_linenumber, l_quantity, l_returnflag FROM lineitem
    """,
)
def projection(spark, sf_dir):
    """P1 (reference dag.py:48): column-pruned projection — reaches the scan."""
    return t(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_linenumber", "l_quantity", "l_returnflag"
    )


# --- F1/F2: cross-column constraint filter ----------------------------------
@register(
    "filter_constraint_le",
    oracle="""
    SELECT l_orderkey, l_linenumber, l_discount, l_tax
    FROM lineitem WHERE l_discount <= l_tax
    """,
)
def filter_constraint_le(spark, sf_dir):
    """F1/F2 (dag.py:116-119): keep rows where colA <= colB."""
    li = t(spark, sf_dir, "lineitem")
    return cleaning.constraint_filter_le(li, "l_discount", "l_tax").select(
        "l_orderkey", "l_linenumber", "l_discount", "l_tax"
    )


# --- F3/F7: positive / equality filters -------------------------------------
@register(
    "filter_positive",
    oracle="""
    SELECT l_orderkey, l_linenumber, l_discount
    FROM lineitem WHERE l_discount > 0
    """,
)
def filter_positive(spark, sf_dir):
    """F3 (dag.py:79,122-123): positive-value filter."""
    li = t(spark, sf_dir, "lineitem")
    return cleaning.positive_filter(li, "l_discount").select(
        "l_orderkey", "l_linenumber", "l_discount"
    )


@register(
    "filter_eq_or_null",
    oracle="""
    SELECT l_orderkey, l_linenumber
    FROM lineitem WHERE l_discount = 0 OR l_discount IS NULL
    """,
)
def filter_eq_or_null(spark, sf_dir):
    """F7 + F4 (Análise.ipynb:1228-1271; dag.py:80-90): zero-or-null probe."""
    li = t(spark, sf_dir, "lineitem")
    cond = (F.col("l_discount") == 0) | F.col("l_discount").isNull()
    return li.filter(cond).select("l_orderkey", "l_linenumber")


# --- F5: negated set membership ---------------------------------------------
@register(
    "filter_not_in",
    oracle="""
    SELECT o_orderkey, o_orderpriority FROM orders
    WHERE o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
    """,
)
def filter_not_in(spark, sf_dir):
    """F5 (dag.py:92-103): ~isin over a domain allow-list."""
    o = t(spark, sf_dir, "orders")
    return o.filter(~F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")).select(
        "o_orderkey", "o_orderpriority"
    )


# --- F6: SQL-string expression filter ----------------------------------------
@register(
    "filter_sql_expr",
    oracle="""
    SELECT l_orderkey, l_linenumber, l_quantity
    FROM lineitem WHERE l_quantity < l_linenumber
    """,
)
def filter_sql_expr(spark, sf_dir):
    """F6 (Análise.ipynb:1140,1150): pandas df.query ≡ Spark string filter."""
    return (
        t(spark, sf_dir, "lineitem")
        .filter("l_quantity < l_linenumber")
        .select("l_orderkey", "l_linenumber", "l_quantity")
    )


# --- F8: conjunctive boolean filter ------------------------------------------
@register(
    "filter_conjunctive",
    oracle="""
    SELECT l_orderkey, l_linenumber FROM lineitem
    WHERE l_returnflag = 'R' AND l_linestatus = 'F' AND l_quantity > 25
    """,
)
def filter_conjunctive(spark, sf_dir):
    """F8 (checkpoint notebook): `(a == x) & (b == y)` conjunction."""
    li = t(spark, sf_dir, "lineitem")
    return li.filter(
        (F.col("l_returnflag") == "R")
        & (F.col("l_linestatus") == "F")
        & (F.col("l_quantity") > 25)
    ).select("l_orderkey", "l_linenumber")


# --- J1: right outer equi-join ------------------------------------------------
@register(
    "join_right_outer",
    oracle="""
    SELECT l.l_orderkey, l.l_linenumber, l.l_partkey, p.p_brand
    FROM (SELECT p_partkey, p_brand FROM part) p
    RIGHT JOIN lineitem l ON p.p_partkey = l.l_partkey
    """,
)
def join_right_outer(spark, sf_dir):
    """J1 (dag.py:48): project left side, right-outer join keeps every fact row."""
    part = t(spark, sf_dir, "part")
    li = t(spark, sf_dir, "lineitem")
    joined = R.right_outer_join(
        part.withColumnRenamed("p_partkey", "l_partkey"),
        li,
        on="l_partkey",
        project_left=["l_partkey", "p_brand"],
    )
    return joined.select("l_orderkey", "l_linenumber", "l_partkey", "p_brand")


# --- J2-J6 shape: chained left joins (see plans/star.py for the full build) ---
@register(
    "join_left_chain",
    oracle="""
    SELECT o.o_orderkey, c.c_name, n.n_name, r.r_name
    FROM orders o
    LEFT JOIN customer c ON o.o_custkey = c.c_custkey
    LEFT JOIN nation n ON c.c_nationkey = n.n_nationkey
    LEFT JOIN region r ON n.n_regionkey = r.r_regionkey
    """,
)
def join_left_chain(spark, sf_dir):
    """J2-J6 (dag.py:241-259): chained broadcast left joins on natural keys."""
    o = t(spark, sf_dir, "orders")
    c = t(spark, sf_dir, "customer")
    n = t(spark, sf_dir, "nation")
    r = t(spark, sf_dir, "region")
    return (
        o.join(F.broadcast(c), o.o_custkey == c.c_custkey, "left")
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey, "left")
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey, "left")
        .select("o_orderkey", "c_name", "n_name", "r_name")
    )


# --- D1: dedup on key, deterministic keep-first -------------------------------
@register(
    "dedup_keep_first",
    oracle="""
    SELECT l_orderkey, l_linenumber, l_partkey, l_suppkey FROM lineitem
    QUALIFY row_number() OVER (PARTITION BY l_orderkey
        ORDER BY l_linenumber, l_partkey, l_suppkey) = 1
    """,
)
def dedup_keep_first(spark, sf_dir):
    """D1 (dag.py:49): drop_duplicates(keep='first') with explicit tiebreaker.

    The tiebreaker must be a total order within the key group — the
    synthetic lineitem has duplicate (orderkey, linenumber) pairs, so
    partkey+suppkey complete it.
    """
    li = t(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_linenumber", "l_partkey", "l_suppkey"
    )
    return R.dedup_keep_first(
        li, subset=["l_orderkey"], order_by=["l_linenumber", "l_partkey", "l_suppkey"]
    )


# --- D2: projected distinct ----------------------------------------------------
@register(
    "distinct_projected",
    oracle="""
    SELECT DISTINCT o_orderpriority, o_orderstatus FROM orders
    """,
)
def distinct_projected(spark, sf_dir):
    """D2 (dag.py:220-236): dimension-style projected distinct."""
    return R.distinct_rows(t(spark, sf_dir, "orders"), ["o_orderpriority", "o_orderstatus"])


# --- D3: composite-key dedup ----------------------------------------------------
@register(
    "dedup_fact_grain",
    oracle="""
    SELECT l_orderkey, l_partkey, l_suppkey, l_linenumber, l_quantity FROM lineitem
    QUALIFY row_number() OVER (
        PARTITION BY l_orderkey, l_partkey, l_suppkey ORDER BY l_linenumber) = 1
    """,
)
def dedup_fact_grain(spark, sf_dir):
    """D3 (dag.py:263): one row per composite fact grain, keep-first."""
    li = t(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_partkey", "l_suppkey", "l_linenumber", "l_quantity"
    )
    return R.dedup_keep_first(
        li, subset=["l_orderkey", "l_partkey", "l_suppkey"], order_by=["l_linenumber"]
    )


# --- U1: union all --------------------------------------------------------------
@register(
    "union_years",
    oracle="""
    SELECT o_orderkey, 1995 AS ano FROM orders WHERE year(o_orderdate) = 1995
    UNION ALL
    SELECT o_orderkey, 1996 AS ano FROM orders WHERE year(o_orderdate) = 1996
    """,
)
def union_years(spark, sf_dir):
    """U1 (dag.py:208): per-year lanes unioned by name (like pd.concat)."""
    o = t(spark, sf_dir, "orders")
    y95 = o.filter(F.year("o_orderdate") == 1995).select(
        "o_orderkey", F.lit(1995).alias("ano")
    )
    y96 = o.filter(F.year("o_orderdate") == 1996).select(
        "o_orderkey", F.lit(1996).alias("ano")
    )
    return R.union_all([y95, y96])


# --- set ops (free in Spark; absent in reference — extension) --------------------
@register(
    "intersect_custkeys",
    oracle="""
    SELECT o_custkey FROM orders WHERE year(o_orderdate) = 1995
    INTERSECT
    SELECT o_custkey FROM orders WHERE year(o_orderdate) = 1996
    """,
)
def intersect_custkeys(spark, sf_dir):
    """INTERSECT (distinct semantics) — §2.4 'free if wanted'."""
    o = t(spark, sf_dir, "orders")
    a = o.filter(F.year("o_orderdate") == 1995).select("o_custkey")
    b = o.filter(F.year("o_orderdate") == 1996).select("o_custkey")
    return a.intersect(b)


@register(
    "except_custkeys",
    oracle="""
    SELECT o_custkey FROM orders WHERE year(o_orderdate) = 1995
    EXCEPT
    SELECT o_custkey FROM orders WHERE year(o_orderdate) = 1996
    """,
)
def except_custkeys(spark, sf_dir):
    """EXCEPT with set (distinct) semantics — `subtract`, not `exceptAll`
    (bag difference keeps keys whose left multiplicity exceeds the right)."""
    o = t(spark, sf_dir, "orders")
    a = o.filter(F.year("o_orderdate") == 1995).select("o_custkey")
    b = o.filter(F.year("o_orderdate") == 1996).select("o_custkey")
    return a.subtract(b)


# --- anti join (the idiomatic upsert sink staging, S9) ----------------------------
@register(
    "anti_join_new_keys",
    oracle="""
    SELECT o_orderkey FROM orders o
    WHERE year(o_orderdate) = 1996
      AND NOT EXISTS (
        SELECT 1 FROM orders e
        WHERE year(e.o_orderdate) = 1995 AND e.o_custkey = o.o_custkey)
    """,
)
def anti_join_new_keys(spark, sf_dir):
    """S9 (dag.py:399-443): INSERT..ON CONFLICT DO NOTHING ≡ left-anti staging."""
    o = t(spark, sf_dir, "orders")
    existing = o.filter(F.year("o_orderdate") == 1995).select("o_custkey")
    incoming = o.filter(F.year("o_orderdate") == 1996)
    return incoming.join(existing, on="o_custkey", how="left_anti").select("o_orderkey")


# --- O1-O3: sorts / top-k ----------------------------------------------------------
@register(
    "sorted_domain",
    oracle="""
    SELECT DISTINCT o_orderpriority FROM orders ORDER BY o_orderpriority
    """,
)
def sorted_domain(spark, sf_dir):
    """O1 (Análise.ipynb:1104+): sorted domain listing."""
    from processo_etl_spark.quality import audit

    return audit.distinct_values(t(spark, sf_dir, "orders"), "o_orderpriority")


@register(
    "top_brands",
    oracle="""
    SELECT p_brand, count(*) AS count FROM part
    GROUP BY p_brand ORDER BY count DESC, p_brand LIMIT 10
    """,
)
def top_brands(spark, sf_dir):
    """A4/O2/O3 (Análise.ipynb:1374): value_counts head-k, deterministic ties."""
    return R.top_k(t(spark, sf_dir, "part"), "p_brand", 10)


@register(
    "join_salted_skew",
    oracle="""
    SELECT c.c_mktsegment AS mktsegment,
           count(*) AS n_orders,
           CAST(SUM(CAST(ROUND(o.o_totalprice, 2) AS DECIMAL(12,2))) AS DOUBLE)
             AS total_price
    FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
    GROUP BY 1
    """,
)
def join_salted_skew(spark, sf_dir):
    """Salted equi-join (operators/skew.salted_join): the big fact side
    gets a random salt, the small side replicates n× so every
    (key, salt) exists — each hot key spreads over n tasks.  The
    explicit fallback for single-key skew AQE's split can't fix.
    Row-level results are provably identical to the plain join, so the
    oracle IS the plain join: the driver's hash check certifies the
    rewrite's equivalence (aggregates in exact decimal → double, so
    partition order can't leak into the sum)."""
    from processo_etl_spark.operators import skew

    o = t(spark, sf_dir, "orders").select("o_custkey", "o_totalprice")
    c = t(spark, sf_dir, "customer").select("c_custkey", "c_mktsegment")
    joined = skew.salted_join(
        o.withColumnRenamed("o_custkey", "custkey"),
        c.withColumnRenamed("c_custkey", "custkey"),
        on="custkey",
        n_salts=8,
    )
    return joined.groupBy(F.col("c_mktsegment").alias("mktsegment")).agg(
        F.count(F.lit(1)).alias("n_orders"),
        F.sum(dec("o_totalprice")).cast("double").alias("total_price"),
    )


@register(
    "fk_orphan_audit",
    oracle="""
    SELECT
      (SELECT count(*) FROM lineitem l
        WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_orderkey = l.l_orderkey))
        AS lineitem_orphan_orders,
      (SELECT count(*) FROM lineitem l
        WHERE NOT EXISTS (SELECT 1 FROM part p WHERE p.p_partkey = l.l_partkey))
        AS lineitem_orphan_parts,
      (SELECT count(*) FROM lineitem l
        WHERE NOT EXISTS (SELECT 1 FROM supplier s WHERE s.s_suppkey = l.l_suppkey))
        AS lineitem_orphan_suppliers,
      (SELECT count(*) FROM orders o
        WHERE NOT EXISTS (SELECT 1 FROM customer c WHERE c.c_custkey = o.o_custkey))
        AS orders_orphan_customers,
      (SELECT count(*) FROM customer c
        WHERE NOT EXISTS (SELECT 1 FROM nation n WHERE n.n_nationkey = c.c_nationkey))
        AS customer_orphan_nations
    """,
)
def fk_orphan_audit(spark, sf_dir):
    """Referential-integrity audit across the star: orphan-FK counts for
    every edge (fact→dims, orders→customer, customer→nation) — the DQ
    gate a warehouse load runs before publishing (the reference's DDL
    declares these FKs; sources/ddl.py emits them — this query VERIFIES
    them set-based).  Each count is a left-anti join against the dim's
    key projection: dims broadcast, the fact never shuffles, and the
    five probes are independent jobs over column-pruned scans."""
    li = t(spark, sf_dir, "lineitem")
    orders = t(spark, sf_dir, "orders")
    cust = t(spark, sf_dir, "customer")

    def orphans(child, fk, parent, pk):
        return child.select(fk).join(
            F.broadcast(parent.select(pk)),
            child[fk] == parent[pk],
            "left_anti",
        ).count()

    counts = {
        "lineitem_orphan_orders": orphans(
            li, "l_orderkey", orders, "o_orderkey"
        ),
        "lineitem_orphan_parts": orphans(
            li, "l_partkey", t(spark, sf_dir, "part"), "p_partkey"
        ),
        "lineitem_orphan_suppliers": orphans(
            li, "l_suppkey", t(spark, sf_dir, "supplier"), "s_suppkey"
        ),
        "orders_orphan_customers": orphans(
            orders, "o_custkey", cust, "c_custkey"
        ),
        "customer_orphan_nations": orphans(
            cust, "c_nationkey", t(spark, sf_dir, "nation"), "n_nationkey"
        ),
    }
    return spark.createDataFrame(
        [tuple(counts.values())], " , ".join(f"{k} long" for k in counts)
    )

"""Differential + semantic tests for the r14-banked heads
(plans/staged_r14).  The module is intentionally NOT registered this
round (the r13 registry froze at 296 when the full-registry artifacts
were regenerated); importing it here does not touch the live
registry."""

from __future__ import annotations

import duckdb
import pytest

from processo_etl_spark import catalog
from processo_etl_spark.plans import staged_r14

SF = "/root/testdata/sf0.001"


def _oracle_con():
    con = duckdb.connect()
    for tname in catalog.TABLES:
        con.execute(
            f"CREATE VIEW {tname} AS SELECT * FROM "
            f"'{catalog.table_path(SF, tname)}'"
        )
    return con


def _multiset(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    key = lambda r: tuple(r[i] for i in order)  # noqa: E731
    return sorted(cols), sorted(map(key, rows))


@pytest.mark.parametrize("name", sorted(staged_r14.STAGED))
def test_staged_head_matches_oracle(spark, name):
    fn, oracle = staged_r14.STAGED[name]
    sdf = fn(spark, SF)
    srows = [tuple(r) for r in sdf.collect()]
    con = _oracle_con()  # keep alive: the relation weak-refs it
    res = con.sql(oracle)
    assert _multiset(sdf.columns, srows) == _multiset(
        res.columns, res.fetchall()
    ), f"{name}: Spark vs DuckDB multiset mismatch"
    assert len(srows) > 0


def test_merge_upsert_semantics(spark):
    """MERGE accounting against independently-computed key sets: every
    pre-cutoff key appears exactly once (update iff %7), every
    post-cutoff %7 key inserts, actions partition the output, and
    updated/inserted rows carry the re-priced payload."""
    import datetime

    from processo_etl_spark.plans.common import t

    orders = t(spark, SF, "orders").select(
        "o_orderkey", "o_totalprice", "o_orderdate"
    )
    cutoff = datetime.datetime(1999, 1, 1)
    base = {
        r["o_orderkey"]: (r["o_totalprice"], r["o_orderdate"] < cutoff)
        for r in orders.collect()
    }
    rows = staged_r14.merge_upsert_orders(spark, SF).collect()
    out = {
        r["o_orderkey"]: (r["o_totalprice"], r["action"]) for r in rows
    }
    assert len(rows) == len(out), "one output row per key"
    for key, (price, in_target) in base.items():
        is_batch = key % 7 == 0
        if in_target:
            want = ("update", price + 1000.0) if is_batch else ("keep", price)
        elif is_batch:
            want = ("insert", price + 1000.0)
        else:
            assert key not in out
            continue
        assert out[key] == (want[1], want[0]), key
    # exercised all three branches at this scale
    assert {a for _, a in out.values()} == {"keep", "update", "insert"}


def test_cdc_apply_semantics(spark):
    """Latest-wins apply against a hand evaluation of the fixture
    rules: %6-and-not-%10 keys are DELETED (D at seq 2 supersedes the
    seq-1 update), %3-not-%6-not-%10 keys update (+100), %20 keys
    insert with the seq-2 payload (+50), other %10 keys insert their
    seq-1 payload, everything else keeps."""
    from processo_etl_spark.plans.common import t

    base = {
        r["o_orderkey"]: r["o_totalprice"]
        for r in t(spark, SF, "orders")
        .select("o_orderkey", "o_totalprice")
        .collect()
    }
    out = {
        r["o_orderkey"]: (r["o_totalprice"], r["action"])
        for r in staged_r14.cdc_apply_latest_wins(spark, SF).collect()
    }
    for key, price in base.items():
        if key % 10 == 0:
            delta = 50.0 if key % 20 == 0 else 0.0
            assert out[key] == (price + delta, "upsert"), key
        elif key % 6 == 0:
            assert key not in out, key  # deleted
        elif key % 3 == 0:
            assert out[key] == (price + 100.0, "upsert"), key
        else:
            assert out[key] == (price, "keep"), key
    assert len(out) == sum(
        1 for k in base if k % 10 == 0 or k % 6 != 0
    )


def test_bucketed_join_is_shuffle_free(spark):
    """The layout certificate itself: the SMJ over the bucketed tables
    must plan with zero Exchange operators, and the head's boolean
    must report it.  (The differential test already grades the
    numeric rollup against the plain-parquet oracle.)"""
    out = staged_r14.bucketed_join_coloc(spark, SF)
    rows = out.collect()
    assert rows and all(r["join_shuffle_free"] is True for r in rows)
    # independent re-check on the tables the head just (re)wrote
    o = spark.table("bkt_orders_sf0_001").hint("merge")
    li = spark.table("bkt_lineitem_sf0_001").hint("merge")
    plan = (
        li.join(o, li.l_orderkey == o.o_orderkey)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "SortMergeJoin" in plan and "Exchange" not in plan


def test_partition_overwrite_preserves_untouched_days(spark):
    """Dynamic-overwrite scope: every day survives, restated days
    (1–10) carry doubled sums, untouched days carry the originals —
    computed independently from the raw parquet."""
    from pyspark.sql import functions as F

    from processo_etl_spark.plans.common import dsum, t

    got = {
        r["day"]: (r["n"], r["sum_value"])
        for r in staged_r14.partition_overwrite_daily(spark, SF).collect()
    }
    raw = {
        r["day"]: (r["n"], r["sum_value"])
        for r in t(spark, SF, "events")
        .groupBy(F.to_date("ts").alias("day"))
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n"),
            dsum("value").alias("sum_value"),
        )
        .collect()
    }
    assert set(got) == set(raw), "no day lost, no day invented"
    for day, (n, sv) in raw.items():
        gn, gsv = got[day]
        assert gn == n
        if day.day <= 10:
            assert gsv == pytest.approx(2 * sv, abs=1e-9)
        else:
            assert gsv == sv


def test_dim_incremental_semantics(spark):
    """High-watermark invariants against an independent rebuild:
    existing keys carry EXACTLY the ids the standalone dimension build
    publishes (stability — downstream facts reference them), new keys
    are exactly the arrival-only combos, their ids are contiguous
    N+1..N+M in sorted-key order, and no id collides."""
    from pyspark.sql import functions as F

    from processo_etl_spark.operators import star
    from processo_etl_spark.plans.common import t

    keys = ["p_brand", "p_type", "p_size"]
    part = t(spark, SF, "part")
    standalone = {
        tuple(r[k] for k in keys): r["dim_id"]
        for r in star.build_dimension(
            part.filter(F.col("p_partkey") % 4 != 0), keys, "dim_id"
        ).collect()
    }
    rows = staged_r14.dim_incremental_surrogates(spark, SF).collect()
    got = {tuple(r[k] for k in keys): (r["dim_id"], r["status"]) for r in rows}
    assert len(got) == len(rows), "one row per natural key"
    n = len(standalone)
    existing = {k: v for k, (v, s) in got.items() if s == "existing"}
    new = {k: v for k, (v, s) in got.items() if s == "new"}
    assert existing == standalone  # published ids are stable
    assert new, "fixture must produce genuinely new keys"
    # contiguous above the watermark, in sorted-natural-key order
    assert sorted(new.values()) == list(range(n + 1, n + 1 + len(new)))
    assert [k for k, _ in sorted(new.items())] == [
        k for k, _ in sorted(new.items(), key=lambda kv: kv[1])
    ]
    assert len(set(got[k][0] for k in got)) == len(got)  # no collisions


def test_quantile_drift_hand_computed(spark, tmp_path):
    """Tiny two-group two-period corpus with known medians through the
    same bucket arithmetic.  Group 'a': even-day values 0.1..0.5 (n=5,
    k=3 -> 0.3 -> bucket 3), odd-day values 1.1..1.5 (k=3 -> 1.3 ->
    bucket 13) -> drift 10.  Group 'b': identical halves -> drift 0."""
    import datetime

    rows = []
    for i in range(5):
        v = (i + 1) / 10.0
        rows.append((datetime.datetime(2024, 1, 2), "a", v))  # even day
        rows.append((datetime.datetime(2024, 1, 3), "a", v + 1.0))  # odd
        rows.append((datetime.datetime(2024, 1, 2), "b", v))
        rows.append((datetime.datetime(2024, 1, 3), "b", v))
    spark.createDataFrame(
        [(i, ts, 1, et, v, None) for i, (ts, et, v) in enumerate(rows)],
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string",
    ).write.mode("overwrite").parquet(str(tmp_path / "events.parquet"))
    got = {
        r["event_type"]: r
        for r in staged_r14.quantile_drift_by_group(
            spark, str(tmp_path)
        ).collect()
    }
    assert got["a"]["p50_bucket_even"] == 3
    assert got["a"]["p50_bucket_odd"] == 13
    assert got["a"]["drift_buckets"] == 10
    assert got["b"]["drift_buckets"] == 0
    assert got["a"]["n_even"] == got["a"]["n_odd"] == 5

"""Differential tests for the r11-staged heads (plans/staged_r11):
each Spark plan runs against its DuckDB oracle at sf0.001 with the
same multiset compare the local harness uses, PLUS semantic hand
checks — so activation at r11 is a pure registration flip of
already-certified pairs.  The module is intentionally NOT registered
this round (window preservation, VERDICT r9 #3); importing it here
does not touch the live registry (plain functions, no decorators)."""

from __future__ import annotations

import duckdb
import pytest
from pyspark.sql import functions as F

from processo_etl_spark import catalog
from processo_etl_spark.plans import staged_r11

SF = "/root/testdata/sf0.001"


def _oracle_con():
    con = duckdb.connect()
    for tname in catalog.TABLES:
        con.execute(
            f"CREATE VIEW {tname} AS SELECT * FROM "
            f"'{catalog.table_path(SF, tname)}'"
        )
    return con


def _norm(v):
    import datetime
    from decimal import Decimal

    if isinstance(v, Decimal):
        return float(v)
    if isinstance(v, datetime.datetime):
        return v.replace(tzinfo=None).isoformat()
    return v


def _multiset(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    key = lambda r: tuple(_norm(r[i]) for i in order)  # noqa: E731
    return sorted(cols), sorted(map(key, rows), key=repr)


@pytest.mark.parametrize("name", sorted(staged_r11.STAGED))
def test_staged_head_matches_oracle(spark, name):
    fn, oracle = staged_r11.STAGED[name]
    sdf = fn(spark, SF)
    srows = sdf.collect()
    scols = sdf.columns
    con = _oracle_con()   # keep alive: the relation weak-refs it
    res = con.sql(oracle)
    dcols, drows = res.columns, res.fetchall()
    assert _multiset(scols, [tuple(r) for r in srows]) == _multiset(
        dcols, drows
    ), f"{name}: Spark vs DuckDB multiset mismatch"
    assert len(srows) > 0


def test_sample_per_key_semantics(spark):
    """Exactly min(k, group size) rows per key, ranks 1..k, and the
    selection is stable under repartitioning (determinism)."""
    fn, _ = staged_r11.STAGED["sample_per_key_deterministic"]
    rows = fn(spark, SF).collect()
    per_key: dict = {}
    for r in rows:
        per_key.setdefault(r["user_id"], []).append(r)
    ev = catalog.load(spark, SF, "events")
    sizes = {
        r["user_id"]: r["n"]
        for r in ev.groupBy("user_id").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    for uid, picked in per_key.items():
        assert len(picked) == min(5, sizes[uid])
        assert sorted(p["rk"] for p in picked) == list(
            range(1, len(picked) + 1)
        )
    # determinism: same sample from a differently-partitioned input
    again = {
        (r["user_id"], r["event_id"])
        for r in fn(spark, SF).sparkSession.createDataFrame(
            fn(spark, SF).collect()
        ).collect()
    }
    assert again == {(r["user_id"], r["event_id"]) for r in rows}


def test_embargo_split_semantics(spark):
    """Counts partition every event, the gap is genuinely quarantined,
    and leakage_safe holds by construction of the boundaries."""
    fn, _ = staged_r11.STAGED["split_temporal_embargo"]
    out = fn(spark, SF).collect()
    ev_n = catalog.load(spark, SF, "events").count()
    assert sum(r["n_train"] + r["n_test"] + r["n_embargoed"] for r in out) == ev_n
    assert all(r["leakage_safe"] for r in out)
    assert any(r["n_embargoed"] > 0 for r in out)  # the gap is non-trivial


def test_equidepth_bins_semantics(spark):
    """NTILE contract: 8 bins, sizes differ by at most 1, boundaries
    are monotone non-overlapping in sort order."""
    fn, _ = staged_r11.STAGED["feature_binning_equidepth"]
    rows = sorted(fn(spark, SF).collect(), key=lambda r: r["bin"])
    assert [r["bin"] for r in rows] == list(range(1, 9))
    sizes = [r["n"] for r in rows]
    assert max(sizes) - min(sizes) <= 1
    assert sum(sizes) == catalog.load(spark, SF, "lineitem").count()
    for a, b in zip(rows, rows[1:]):
        assert a["lo"] <= a["hi"] <= b["lo"] <= b["hi"]

"""As-of join: backward/forward, by-keys, unmatched rows, tolerance."""

import datetime as dt

import pytest

from biosets_spark.operators.asof import asof_join


def t(minute):
    return dt.datetime(2024, 1, 1, 0, minute)


@pytest.fixture()
def trades_quotes(spark):
    trades = spark.createDataFrame(
        [(1, "A", t(5)), (2, "A", t(10)), (3, "B", t(7)), (4, "B", t(1))],
        "trade_id int, sym string, ts timestamp",
    )
    quotes = spark.createDataFrame(
        [("A", t(4), 100.0), ("A", t(9), 101.0), ("B", t(6), 200.0)],
        "sym string, ts timestamp, px double",
    )
    return trades, quotes


def test_asof_backward(trades_quotes):
    trades, quotes = trades_quotes
    out = {r.trade_id: r.right_px for r in asof_join(trades, quotes, on="ts", by="sym").collect()}
    assert out == {1: 100.0, 2: 101.0, 3: 200.0, 4: None}


def test_asof_forward(trades_quotes):
    trades, quotes = trades_quotes
    out = {
        r.trade_id: r.right_px
        for r in asof_join(trades, quotes, on="ts", by="sym", direction="forward").collect()
    }
    assert out == {1: 101.0, 2: None, 3: None, 4: 200.0}


def test_asof_equal_ts_matches(spark):
    left = spark.createDataFrame([(1, t(5))], "id int, ts timestamp")
    right = spark.createDataFrame([(t(5), 7.0)], "ts timestamp, v double")
    out = asof_join(left, right, on="ts").collect()
    assert out[0].right_v == 7.0


def test_asof_tolerance(trades_quotes):
    trades, quotes = trades_quotes
    out = {
        r.trade_id: r.right_px
        for r in asof_join(
            trades, quotes, on="ts", by="sym",
            tolerance_expr="{l} <= {r} + INTERVAL 2 MINUTES",
        ).collect()
    }
    # trade 1 @5 matched quote @4 (within 2min); trade 2 @10 matched
    # quote @9 (within); trade 3 @7 matched quote @6 (within)
    assert out == {1: 100.0, 2: 101.0, 3: 200.0, 4: None}

"""Wave-37 semantics: moment skew/kurtosis, rolling median."""

from __future__ import annotations

import math
import statistics

import biosets_spark.queries.wave37  # noqa: F401  (registers the wave)
from biosets_spark.queries import QUERIES
from tests.conftest import SF_SMOKE


def test_skew_kurtosis_matches_bruteforce(spark):
    rows = {r["event_type"]: r
            for r in QUERIES["q_skew_kurtosis"].fn(spark, SF_SMOKE).collect()}
    ev = spark.read.parquet(f"{SF_SMOKE}/events.parquet").collect()
    by_type = {}
    for e in ev:
        by_type.setdefault(e["event_type"], []).append(round(e["value"] * 100))
    assert set(rows) == set(by_type)
    for t, cents in by_type.items():
        n = len(cents)
        mu = sum(cents) / n
        m2 = sum((c - mu) ** 2 for c in cents) / n
        m3 = sum((c - mu) ** 3 for c in cents) / n
        m4 = sum((c - mu) ** 4 for c in cents) / n
        r = rows[t]
        assert r["n_events"] == n
        assert abs(r["mean_value"] - round(mu / 100, 6)) < 1e-5
        assert abs(r["stddev_pop"] - round(math.sqrt(m2) / 100, 6)) < 1e-5
        assert abs(r["skewness"] - round(m3 / m2**1.5, 6)) < 1e-4
        assert abs(r["excess_kurtosis"] - round(m4 / m2**2 - 3, 6)) < 1e-4


def test_rolling_median_window_semantics(spark):
    rows = QUERIES["q_rolling_median"].fn(spark, SF_SMOKE).collect()
    by_pri = {}
    for r in rows:
        by_pri.setdefault(r["o_orderpriority"], []).append(r)
    for pri, series in by_pri.items():
        series.sort(key=lambda r: r["day"])
        cents = [r["revenue_cents"] for r in series]
        for i, r in enumerate(series):
            lo, hi = max(0, i - 3), min(len(cents), i + 4)
            expect = statistics.median(cents[lo:hi])
            assert abs(r["rolling_median_cents"] - round(expect, 1)) < 1e-6, (
                pri, r["day"])
    # the median is robust: it lies within the window's min/max
    for pri, series in by_pri.items():
        cents = [r["revenue_cents"] for r in series]
        for i, r in enumerate(series):
            lo, hi = max(0, i - 3), min(len(cents), i + 4)
            assert min(cents[lo:hi]) <= r["rolling_median_cents"] <= max(cents[lo:hi])

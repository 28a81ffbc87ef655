"""Wave-47 semantics: cohort LTV curve, forecast backtest."""

from __future__ import annotations

from collections import defaultdict

import biosets_spark.queries.wave47  # noqa: F401  (registers the wave)
from biosets_spark.queries import QUERIES
from tests.conftest import SF_SMOKE


def test_cohort_ltv_monotone_and_reconciles(spark):
    rows = QUERIES["q_cohort_ltv"].fn(spark, SF_SMOKE).collect()
    orders = spark.read.parquet(f"{SF_SMOKE}/orders.parquet").collect()
    first = {}
    for o in orders:
        m = (o["o_orderdate"].year, o["o_orderdate"].month)
        k = o["o_custkey"]
        if k not in first or m < first[k]:
            first[k] = m
    cohort_sizes = defaultdict(set)
    for k, m in first.items():
        cohort_sizes[m].add(k)
    by_cohort = defaultdict(list)
    for r in rows:
        by_cohort[(r["cohort"].year, r["cohort"].month)].append(r)
    assert set(by_cohort) <= set(cohort_sizes)
    for m, series in by_cohort.items():
        series.sort(key=lambda r: r["age_months"])
        # cohort size constant along the curve, matches brute force
        assert {r["n_customers"] for r in series} == {len(cohort_sizes[m])}
        # LTV is cumulative: non-decreasing in age
        vals = [r["ltv_per_customer"] for r in series]
        assert vals == sorted(vals)
        # age 0 exists (the cohort's own first month)
        assert series[0]["age_months"] == 0
        assert 0 <= series[0]["ltv_per_customer"]


def test_forecast_backtest_matches_bruteforce(spark):
    rows = {r["event_type"]: r
            for r in QUERIES["q_forecast_backtest"].fn(spark, SF_SMOKE).collect()}
    ev = spark.read.parquet(f"{SF_SMOKE}/events.parquet").collect()
    daily = defaultdict(int)
    for e in ev:
        daily[(e["event_type"], e["ts"].date())] += round(e["value"] * 100)
    by_type = defaultdict(list)
    for (t, d), c in daily.items():
        by_type[t].append((d, c))
    for t, series in by_type.items():
        series.sort()
        n = 0
        mape = smape = 0.0
        for i in range(7, len(series)):
            cents = series[i][1]
            fc = series[i - 7][1]
            if cents > 0:
                n += 1
                mape += round(abs(cents - fc) / cents, 8)
                smape += round(2 * abs(cents - fc) / (cents + fc), 8)
        r = rows[t]
        assert r["n_scored"] == n
        assert abs(r["mape"] - round(mape / n, 6)) < 1e-6
        assert abs(r["smape"] - round(smape / n, 6)) < 1e-6
        # SMAPE is bounded by 2 by construction
        assert 0 <= r["smape"] <= 2

"""Wave-59 semantics: control chart, seasonal strength."""

from __future__ import annotations

import math
from collections import defaultdict

import biosets_spark.queries.wave59  # noqa: F401  (registers the wave)
from biosets_spark.queries import QUERIES
from tests.conftest import SF_SMOKE


def _daily_means(spark):
    ev = spark.read.parquet(f"{SF_SMOKE}/events.parquet").collect()
    acc = defaultdict(lambda: [0, 0])
    for e in ev:
        a = acc[(e["event_type"], e["ts"].date())]
        a[0] += round(round(e["value"], 2) * 100)
        a[1] += 1
    return {k: round(c / 100 / n, 6) for k, (c, n) in acc.items()}


def test_control_chart_matches_bruteforce(spark):
    rows = {r["event_type"]: r
            for r in QUERIES["q_control_chart"].fn(spark, SF_SMOKE).collect()}
    daily = _daily_means(spark)
    by_type = defaultdict(list)
    for (t, _), m in daily.items():
        by_type[t].append(m)
    for t, ms in by_type.items():
        r = rows[t]
        n = len(ms)
        mu = sum(ms) / n
        sigma = math.sqrt(sum(m * m for m in ms) / n - mu * mu)
        assert r["n_days"] == n
        assert abs(r["center_line"] - round(mu, 6)) < 1e-5
        assert abs(r["ucl"] - round(mu + 3 * sigma, 6)) < 1e-4
        assert abs(r["lcl"] - round(mu - 3 * sigma, 6)) < 1e-4
        n3 = sum(1 for m in ms if m > mu + 3 * sigma or m < mu - 3 * sigma)
        n2 = sum(1 for m in ms if m > mu + 2 * sigma or m < mu - 2 * sigma)
        assert (r["n_beyond_3sigma"], r["n_beyond_2sigma"]) == (n3, n2)
        # 3-sigma violations are a subset of 2-sigma ones
        assert r["n_beyond_3sigma"] <= r["n_beyond_2sigma"]


def test_seasonal_strength_matches_bruteforce(spark):
    rows = {r["event_type"]: r
            for r in QUERIES["q_seasonal_strength"].fn(spark, SF_SMOKE).collect()}
    daily = _daily_means(spark)
    by_type = defaultdict(list)
    for (t, day), m in daily.items():
        by_type[t].append((day.isoweekday(), m))
    for t, series in by_type.items():
        r = rows[t]
        gm = sum(m for _, m in series) / len(series)
        dow_mean = defaultdict(list)
        for d, m in series:
            dow_mean[d].append(m)
        sm = {d: sum(v) / len(v) for d, v in dow_mean.items()}
        tot = sum(round((m - gm) ** 2, 10) for _, m in series)
        rem = sum(round((m - sm[d]) ** 2, 10) for d, m in series)
        fs = max(1 - rem / tot, 0)
        assert r["n_days"] == len(series)
        assert abs(r["seasonal_strength"] - round(fs, 6)) < 1e-5
        assert 0 <= r["seasonal_strength"] <= 1

"""Wave-60 semantics: Mann-Kendall trend test, Gumbel block maxima."""

from __future__ import annotations

import math
from collections import defaultdict

import biosets_spark.queries.wave60 as w60  # noqa: F401  (registers the wave)
from biosets_spark.queries import QUERIES
from tests.conftest import SF_SMOKE


def _daily_means(events):
    acc = defaultdict(lambda: [0, 0])  # (type, day) -> [cents_sum, n]
    for e in events:
        k = (e["event_type"], e["ts"].date())
        acc[k][0] += round(round(e["value"], 2) * 100)
        acc[k][1] += 1
    return {k: round(c / 100 / n, 6) for k, (c, n) in acc.items()}


def test_mann_kendall_matches_bruteforce(spark):
    rows = {r["event_type"]: r
            for r in QUERIES["q_mann_kendall"].fn(spark, SF_SMOKE).collect()}
    events = spark.read.parquet(f"{SF_SMOKE}/events.parquet").collect()
    daily = _daily_means(events)
    series = defaultdict(list)
    for (et, day), m in daily.items():
        series[et].append((day, m))
    for et, pts in series.items():
        pts.sort()
        ms = [m for _, m in pts]
        n = len(ms)
        s = sum(
            (ms[j] > ms[i]) - (ms[j] < ms[i])
            for i in range(n) for j in range(i + 1, n)
        )
        ties = defaultdict(int)
        for m in ms:
            ties[m] += 1
        tie_term = sum(t * (t - 1) * (2 * t + 5) for t in ties.values())
        var_s = (n * (n - 1) * (2 * n + 5) - tie_term) / 18
        if s > 0:
            z = (s - 1) / math.sqrt(var_s)
        elif s < 0:
            z = (s + 1) / math.sqrt(var_s)
        else:
            z = 0.0
        r = rows[et]
        assert r["n_days"] == n
        assert r["s_stat"] == s
        assert abs(r["var_s"] - round(var_s, 6)) < 1e-6
        assert abs(r["z_mk"] - round(z, 6)) < 1e-6
        # |z| is bounded for n-day series: |S| <= C(n,2)
        assert abs(r["z_mk"]) < n


def test_gumbel_matches_bruteforce(spark):
    rows = {r["event_type"]: r
            for r in QUERIES["q_gumbel_maxima"].fn(spark, SF_SMOKE).collect()}
    events = spark.read.parquet(f"{SF_SMOKE}/events.parquet").collect()
    mx = defaultdict(float)
    for e in events:
        k = (e["event_type"], e["ts"].date())
        mx[k] = max(mx[k], round(e["value"], 2)) if k in mx else round(e["value"], 2)
    series = defaultdict(list)
    for (et, _), v in mx.items():
        series[et].append(v)
    euler, pi = 0.5772156649015329, math.pi
    for et, vs in series.items():
        n = len(vs)
        mean = sum(vs) / n
        var = sum(v * v for v in vs) / n - mean ** 2
        beta = math.sqrt(6 * var) / pi
        mu = mean - euler * beta
        lvl = mu - beta * math.log(-math.log(0.99))
        r = rows[et]
        assert r["n_blocks"] == n
        assert abs(r["block_mean"] - round(mean, 6)) < 1e-4
        assert abs(r["gumbel_mu"] - round(mu, 6)) < 1e-4
        assert abs(r["gumbel_beta"] - round(beta, 6)) < 1e-4
        assert abs(r["return_level_100"] - round(lvl, 6)) < 1e-4
        # return level sits above the observed mean block max
        assert r["return_level_100"] > r["block_mean"]

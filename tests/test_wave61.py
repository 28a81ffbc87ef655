"""Wave-61 semantics: Kendall tau-b, Hodges-Lehmann estimator."""

from __future__ import annotations

import math
import statistics
from collections import defaultdict

import biosets_spark.queries.wave61 as w61  # noqa: F401  (registers the wave)
from biosets_spark.queries import QUERIES
from tests.conftest import SF_SMOKE


def _daily(events):
    acc = defaultdict(lambda: [0, 0])
    for e in events:
        k = (e["event_type"], e["ts"].date())
        acc[k][0] += round(round(e["value"], 2) * 100)
        acc[k][1] += 1
    series = defaultdict(list)
    for (et, day), (c, n) in acc.items():
        series[et].append((day, n, round(c / 100 / n, 6)))
    for pts in series.values():
        pts.sort()
    return series


def test_kendall_tau_matches_bruteforce(spark):
    rows = {r["event_type"]: r
            for r in QUERIES["q_kendall_tau"].fn(spark, SF_SMOKE).collect()}
    events = spark.read.parquet(f"{SF_SMOKE}/events.parquet").collect()
    for et, pts in _daily(events).items():
        n = len(pts)
        nc = nd = 0
        for i in range(n):
            for j in range(i + 1, n):
                p = (pts[j][1] - pts[i][1]) * (pts[j][2] - pts[i][2])
                nc += p > 0
                nd += p < 0
        tx = defaultdict(int)
        ty = defaultdict(int)
        for _, x, y in pts:
            tx[x] += 1
            ty[y] += 1
        n0 = n * (n - 1) / 2
        n1 = sum(t * (t - 1) / 2 for t in tx.values())
        n2 = sum(t * (t - 1) / 2 for t in ty.values())
        tau = (nc - nd) / math.sqrt((n0 - n1) * (n0 - n2))
        r = rows[et]
        assert (r["n_days"], r["concordant"], r["discordant"]) == (n, nc, nd)
        assert abs(r["tau_b"] - round(tau, 6)) < 1e-6
        assert -1 <= r["tau_b"] <= 1


def test_hodges_lehmann_matches_bruteforce(spark):
    rows = {r["event_type"]: r
            for r in QUERIES["q_hodges_lehmann"].fn(spark, SF_SMOKE).collect()}
    events = spark.read.parquet(f"{SF_SMOKE}/events.parquet").collect()
    for et, pts in _daily(events).items():
        ms = [m for _, _, m in pts]
        walsh = [(ms[i] + ms[j]) / 2
                 for i in range(len(ms)) for j in range(i, len(ms))]
        r = rows[et]
        assert r["n_walsh"] == len(walsh)
        assert abs(r["hl_estimate"] - round(statistics.median(walsh), 6)) < 1e-6
        assert abs(r["plain_median"] - round(statistics.median(ms), 6)) < 1e-6
        # HL sits inside the data range
        assert min(ms) <= r["hl_estimate"] <= max(ms)

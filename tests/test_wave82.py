"""Wave-82 semantics: Brown-Forsythe Levene, Grubbs test."""

from __future__ import annotations

import math
import statistics
from collections import defaultdict

import biosets_spark.queries.wave82 as w82  # noqa: F401  (registers the wave)
from biosets_spark.queries import QUERIES
from tests.conftest import SF_SMOKE


def _daily_mc(spark):
    events = spark.read.parquet(f"{SF_SMOKE}/events.parquet").collect()
    acc = defaultdict(lambda: [0, 0])
    for e in events:
        k = (e["event_type"], e["ts"].date())
        acc[k][0] += round(round(e["value"], 2) * 100)
        acc[k][1] += 1
    series = defaultdict(list)
    for (et, day), (c, n) in acc.items():
        series[et].append((day, math.floor(c / 100 / n * 100 + 0.5)))
    for pts in series.values():
        pts.sort()
    return series


def test_levene_bf_matches_bruteforce(spark):
    (row,) = QUERIES["q_levene_bf"].fn(spark, SF_SMOKE).collect()
    series = _daily_mc(spark)
    groups = []
    for et, pts in series.items():
        mcs = [m for _, m in pts]
        md = statistics.median(mcs)
        groups.append([round(abs(m - md), 6) for m in mcs])
    nt = sum(len(g) for g in groups)
    k = len(groups)
    grand = sum(sum(g) for g in groups) / nt
    ssb = sum(round((sum(g) / len(g) - grand) ** 2 * len(g), 6)
              for g in groups)
    ssw = sum(round(sum(round(z * z, 6) for z in g)
                    - sum(g) ** 2 / len(g), 6) for g in groups)
    f = (ssb / (k - 1)) / (ssw / (nt - k))
    assert row["n_groups"] == k
    assert row["n_days_total"] == nt
    assert abs(row["f_stat"] - round(f, 6)) < 1e-4
    assert row["reject_equal_var_5pct"] == (f > 2.45)
    assert row["f_stat"] >= 0


def test_grubbs_matches_bruteforce(spark):
    rows = {r["event_type"]: r
            for r in QUERIES["q_grubbs_test"].fn(spark, SF_SMOKE).collect()}
    series = _daily_mc(spark)
    for et, pts in series.items():
        mcs = [m for _, m in pts]
        n = len(mcs)
        mu = sum(mcs) / n
        sd = math.sqrt(sum(round((m - mu) ** 2, 6) for m in mcs) / (n - 1))
        best = max(pts, key=lambda p: (abs(p[1] - mu) / sd, p[0]))
        # replicate the (g DESC, day ASC) tie-break: highest g, then
        # earliest day among exact ties
        gmax = max(abs(m - mu) / sd for _, m in pts)
        candidates = [d for d, m in pts if abs(abs(m - mu) / sd - gmax) < 1e-12]
        r = rows[et]
        assert r["n_days"] == n
        assert r["worst_day"] == min(candidates)
        assert abs(r["grubbs_g"] - round(gmax, 6)) < 1e-5
        assert r["outlier_5pct"] == (gmax > 2.9085)
        # G is bounded by (n-1)/sqrt(n)
        assert r["grubbs_g"] <= (n - 1) / math.sqrt(n) + 1e-9

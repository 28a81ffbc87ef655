"""Wave-88 semantics: CAPM beta, maximum drawdown."""

from __future__ import annotations

import math
from collections import defaultdict

import biosets_spark.queries.wave88 as w88  # noqa: F401  (registers the wave)
from biosets_spark.queries import QUERIES
from tests.conftest import SF_SMOKE


def test_capm_beta_matches_bruteforce(spark):
    rows = {r["event_type"]: r
            for r in QUERIES["q_capm_beta"].fn(spark, SF_SMOKE).collect()}
    events = spark.read.parquet(f"{SF_SMOKE}/events.parquet").collect()
    acc = defaultdict(lambda: [0, 0])
    mkt = defaultdict(lambda: [0, 0])
    for e in events:
        day = e["ts"].date()
        c = round(round(e["value"], 2) * 100)
        acc[(e["event_type"], day)][0] += c
        acc[(e["event_type"], day)][1] += 1
        mkt[day][0] += c
        mkt[day][1] += 1
    m_of = {d: math.floor(c / 100 / n * 100 + 0.5)
            for d, (c, n) in mkt.items()}
    series = defaultdict(list)
    for (et, day), (c, n) in acc.items():
        series[et].append((math.floor(c / 100 / n * 100 + 0.5), m_of[day]))
    for et, pts in series.items():
        n = len(pts)
        sy = float(sum(y for y, _ in pts))
        sm = float(sum(m for _, m in pts))
        sym = float(sum(y * m for y, m in pts))
        smm = float(sum(m * m for _, m in pts))
        beta = (n * sym - sy * sm) / (n * smm - sm * sm)
        alpha = (sy - beta * sm) / n / 100
        r = rows[et]
        assert r["n_days"] == n
        assert abs(r["beta"] - round(beta, 6)) < 1e-4
        assert abs(r["alpha_value"] - round(alpha, 4)) < 1e-2


def test_max_drawdown_matches_bruteforce(spark):
    rows = {r["c_mktsegment"]: r
            for r in QUERIES["q_max_drawdown"].fn(spark, SF_SMOKE).collect()}
    orders = spark.read.parquet(f"{SF_SMOKE}/orders.parquet").collect()
    seg_of = {c["c_custkey"]: c["c_mktsegment"]
              for c in spark.read.parquet(f"{SF_SMOKE}/customer.parquet").collect()}
    daily = defaultdict(lambda: defaultdict(int))
    for o in orders:
        daily[seg_of[o["o_custkey"]]][o["o_orderdate"]] += round(
            o["o_totalprice"] * 100
        )
    for seg, days in daily.items():
        cum = 0
        peak = 0
        best = None
        for day in sorted(days):
            cum += days[day]
            peak = max(peak, cum)
            dd = (peak - cum) / peak
            key = (-dd, day)
            if best is None or key < best[0]:
                best = (key, day, dd)
        r = rows[seg]
        assert r["trough_day"] == best[1]
        assert abs(r["max_drawdown"] - round(best[2], 6)) < 1e-9
        # positive daily revenue means a monotone path: drawdown is 0,
        # and the audit pins that invariant (nonzero = corrupt data)
        assert r["max_drawdown"] == 0.0

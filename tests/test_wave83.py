"""Wave-83 semantics: Page's L test, CVaR expected shortfall."""

from __future__ import annotations

import datetime
import math
from collections import defaultdict

import biosets_spark.queries.wave83 as w83  # noqa: F401  (registers the wave)
from biosets_spark.queries import QUERIES
from tests.conftest import SF_SMOKE


def test_page_trend_matches_bruteforce(spark):
    (row,) = QUERIES["q_page_trend"].fn(spark, SF_SMOKE).collect()
    events = spark.read.parquet(f"{SF_SMOKE}/events.parquet").collect()
    acc = defaultdict(lambda: [0, 0])
    for e in events:
        day = e["ts"].date()
        acc[day][0] += round(round(e["value"], 2) * 100)
        acc[day][1] += 1
    anchor = datetime.date(2024, 1, 1)
    weeks = defaultdict(dict)
    for day, (c, n) in acc.items():
        mc = math.floor(c / 100 / n * 100 + 0.5)
        wk = (day - anchor).days // 7
        dow = day.isoweekday()
        weeks[wk][dow] = mc
    rsum = defaultdict(float)
    n_weeks = 0
    for wk, ms in weeks.items():
        if len(ms) != 7:
            continue
        n_weeks += 1
        vals = sorted(ms.values())
        for dow, m in ms.items():
            lo = 1 + sum(1 for v in vals if v < m)
            ties = sum(1 for v in vals if v == m)
            rsum[dow] += lo + (ties - 1) / 2
    k = 7
    l_stat = sum(d * r for d, r in rsum.items())
    el = n_weeks * k * (k + 1) ** 2 / 4
    sigma = math.sqrt(n_weeks * k ** 2 * (k + 1) * (k ** 2 - 1) / 144)
    assert row["n_weeks"] == n_weeks
    assert row["k_weekdays"] == k
    assert abs(row["page_l"] - round(l_stat, 1)) < 1e-6
    assert abs(row["expected_l"] - round(el, 1)) < 1e-6
    assert abs(row["z_page"] - round((l_stat - el) / sigma, 6)) < 1e-6


def test_cvar_matches_bruteforce(spark):
    rows = {r["c_mktsegment"]: r
            for r in QUERIES["q_cvar_shortfall"].fn(spark, SF_SMOKE).collect()}
    orders = spark.read.parquet(f"{SF_SMOKE}/orders.parquet").collect()
    seg_of = {c["c_custkey"]: c["c_mktsegment"]
              for c in spark.read.parquet(f"{SF_SMOKE}/customer.parquet").collect()}
    by_seg = defaultdict(list)
    for o in orders:
        by_seg[seg_of[o["o_custkey"]]].append(round(o["o_totalprice"] * 100))
    for seg, vals in by_seg.items():
        vals.sort(reverse=True)
        n = len(vals)
        k = math.ceil(0.05 * n)
        tail = vals[:k]
        r = rows[seg]
        assert r["n_orders"] == n
        assert r["n_tail"] == k
        assert abs(r["var_95"] - round(min(tail) / 100, 2)) < 1e-9
        assert abs(r["cvar_95"] - round(sum(tail) / k / 100, 2)) < 1e-2
        # the shortfall dominates the cut by definition
        assert r["cvar_95"] >= r["var_95"]

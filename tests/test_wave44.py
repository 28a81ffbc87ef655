"""Wave-44 semantics: seasonal index, burstiness."""

from __future__ import annotations

import math
from collections import defaultdict

import biosets_spark.queries.wave44  # noqa: F401  (registers the wave)
from biosets_spark.queries import QUERIES
from tests.conftest import SF_SMOKE


def test_seasonal_index_matches_bruteforce(spark):
    rows = {r["dow"]: r
            for r in QUERIES["q_seasonal_index"].fn(spark, SF_SMOKE).collect()}
    orders = spark.read.parquet(f"{SF_SMOKE}/orders.parquet").collect()
    daily = defaultdict(int)
    for o in orders:
        daily[o["o_orderdate"].date()] += round(o["o_totalprice"] * 100)
    per_dow = defaultdict(lambda: [0, 0])
    for day, cents in daily.items():
        d = day.isoweekday()
        per_dow[d][0] += 1
        per_dow[d][1] += cents
    all_days = sum(v[0] for v in per_dow.values())
    all_cents = sum(v[1] for v in per_dow.values())
    assert set(rows) == set(per_dow)
    for d, (n, cents) in per_dow.items():
        r = rows[d]
        assert (r["n_days"], r["total_cents"]) == (n, cents)
        expect = (cents / n) / (all_cents / all_days)
        assert abs(r["seasonal_index"] - round(expect, 6)) < 1e-6
    # weighted mean of indices is 1 by construction
    wmean = sum(rows[d]["seasonal_index"] * per_dow[d][0] for d in per_dow) / all_days
    assert abs(wmean - 1) < 0.01


def test_burstiness_matches_bruteforce(spark):
    rows = {r["event_type"]: r
            for r in QUERIES["q_burstiness"].fn(spark, SF_SMOKE).collect()}
    ev = sorted(
        spark.read.parquet(f"{SF_SMOKE}/events.parquet").collect(),
        key=lambda e: (e["user_id"], e["event_type"], e["ts"], e["event_id"]),
    )
    gaps = defaultdict(list)
    for a, b in zip(ev, ev[1:]):
        if a["user_id"] == b["user_id"] and a["event_type"] == b["event_type"]:
            gaps[b["event_type"]].append(
                int((b["ts"] - a["ts"]).total_seconds() * 1_000_000))
    assert set(rows) == set(gaps)
    for t, g in gaps.items():
        r = rows[t]
        assert r["n_gaps"] == len(g)
        mu = sum(g) / len(g)
        var = sum(x * x for x in g) / len(g) - mu * mu
        sigma = math.sqrt(var)
        assert abs(r["mean_gap_s"] - round(mu / 1e6, 6)) < 1e-5
        assert abs(r["stddev_gap_s"] - round(sigma / 1e6, 6)) < 1e-4
        assert abs(r["burstiness"] - round((sigma - mu) / (sigma + mu), 6)) < 1e-5
        assert -1 <= r["burstiness"] <= 1

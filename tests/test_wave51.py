"""Wave-51 semantics: retention half-life, peak concurrency."""

from __future__ import annotations

import math
from collections import defaultdict

import biosets_spark.queries.wave51  # noqa: F401  (registers the wave)
from biosets_spark.queries import QUERIES
from tests.conftest import SF_SMOKE


def test_retention_half_life_matches_bruteforce(spark):
    rows = QUERIES["q_retention_half_life"].fn(spark, SF_SMOKE).collect()
    ev = spark.read.parquet(f"{SF_SMOKE}/events.parquet").collect()
    first = {}
    act = defaultdict(set)
    for e in ev:
        d = e["ts"].date()
        u = e["user_id"]
        if u not in first or d < first[u]:
            first[u] = d
    for e in ev:
        act[e["user_id"]].add((e["ts"].date() - first[e["user_id"]]).days)
    cohort = len(first)
    curve = defaultdict(int)
    for u, offs in act.items():
        for off in offs:
            if 1 <= off <= 14:
                curve[off] += 1
    pts = [(off, n) for off, n in sorted(curve.items()) if n > 0]
    assert [(r["day_offset"], r["n_active"]) for r in rows] == pts
    lys = [round(math.log(n / cohort), 12) for _, n in pts]
    xys = [round(off * math.log(n / cohort), 12) for off, n in pts]
    xs = [off for off, _ in pts]
    n = len(pts)
    slope = (n * sum(xys) - sum(xs) * sum(lys)) / (
        n * sum(x * x for x in xs) - sum(xs) ** 2)
    hl = round(-math.log(2) / slope, 4)
    for r in rows:
        assert abs(r["retention"] - (curve[r["day_offset"]] / cohort)) < 1e-06
        assert abs(r["half_life_days"] - hl) < 1e-3


def test_peak_concurrency_matches_bruteforce(spark):
    rows = {(r["event_type"], r["day"]): r["peak_concurrent"]
            for r in QUERIES["q_peak_concurrency"].fn(spark, SF_SMOKE).collect()}
    ev = spark.read.parquet(f"{SF_SMOKE}/events.parquet").collect()
    groups = defaultdict(list)
    for e in ev:
        us = int(e["ts"].timestamp() * 1_000_000)
        key = (e["event_type"], e["ts"].date())
        groups[key].append((us, 1, e["event_id"]))
        groups[key].append((us + 300_000_000, -1, e["event_id"]))
    assert set(rows) == set(groups)
    for key, ends in groups.items():
        ends.sort()
        cur = peak = 0
        for _, d, _ in ends:
            cur += d
            peak = max(peak, cur)
        assert rows[key] == peak, key
        # peak is at least 1 and at most the day's event count
        assert 1 <= peak <= sum(1 for _, d, _ in ends if d == 1)

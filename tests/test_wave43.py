"""Wave-43 semantics: jackknife SE, Markov entropy rate."""

from __future__ import annotations

import math
from collections import Counter, defaultdict

import biosets_spark.queries.wave43  # noqa: F401  (registers the wave)
from biosets_spark.queries import QUERIES
from tests.conftest import SF_SMOKE


def test_jackknife_matches_bruteforce(spark):
    (row,) = QUERIES["q_jackknife_variance"].fn(spark, SF_SMOKE).collect()
    li = spark.read.parquet(f"{SF_SMOKE}/lineitem.parquet").collect()
    groups = defaultdict(lambda: [0, 0])
    for x in li:
        g = (x["l_shipdate"].year, x["l_shipdate"].month)
        groups[g][0] += round(x["l_discount"] * 100)
        groups[g][1] += 1
    ts = sum(v[0] for v in groups.values())
    tn = sum(v[1] for v in groups.values())
    ng = len(groups)
    assert (row["n_groups"], row["n_rows"]) == (ng, tn)
    assert abs(row["mean_discount"] - (ts / tn / 100)) < 1e-06
    loo = [round((ts - s) / (tn - n), 12) for s, n in groups.values()]
    m = sum(loo) / ng
    var = (ng - 1) / ng * sum((e - m) ** 2 for e in loo)
    assert abs(row["jackknife_se"] - (math.sqrt(var) / 100)) < 2e-06
    # jackknife SE of a mean over G balanced-ish groups is near the
    # classical se/sqrt(n) order of magnitude — sanity band
    assert 0 < row["jackknife_se"] < 0.01


def test_entropy_rate_matches_bruteforce(spark):
    rows = {r["event_type"]: r
            for r in QUERIES["q_entropy_rate"].fn(spark, SF_SMOKE).collect()}
    ev = sorted(
        spark.read.parquet(f"{SF_SMOKE}/events.parquet").collect(),
        key=lambda e: (e["user_id"], e["ts"], e["event_id"]),
    )
    cells = Counter()
    for a, b in zip(ev, ev[1:]):
        if a["user_id"] == b["user_id"]:
            cells[(a["event_type"], b["event_type"])] += 1
    ni = Counter()
    for (s, _), c in cells.items():
        ni[s] += c
    big_n = sum(cells.values())
    assert set(rows) == set(ni)
    total_rate = 0.0
    for s, r in rows.items():
        assert r["n_transitions"] == ni[s]
        assert abs(r["p_state"] - (ni[s] / big_n)) < 1e-06
        h = sum(
            round(-(c / ni[s]) * math.log(c / ni[s]), 12)
            for (src, _), c in cells.items() if src == s
        )
        assert abs(r["cond_entropy"] - (h)) < 1e-06
        assert abs(r["rate_contrib"] - (ni[s] / big_n * h)) < 1e-05
        # conditional entropy bounded by ln(branching factor)
        k = len([1 for (src, _) in cells if src == s])
        assert -1e-9 <= r["cond_entropy"] <= math.log(max(k, 2)) + 1e-9
        total_rate += r["rate_contrib"]
    assert total_rate >= 0

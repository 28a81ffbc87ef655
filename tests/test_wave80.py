"""Wave-80 semantics: Cp/Cpk capability, exact trimmed mean."""

from __future__ import annotations

import math
from collections import defaultdict

import biosets_spark.queries.wave80 as w80  # noqa: F401  (registers the wave)
from biosets_spark.queries import QUERIES
from tests.conftest import SF_SMOKE


def test_cpk_matches_bruteforce(spark):
    rows = {r["event_type"]: r
            for r in QUERIES["q_cpk_capability"].fn(spark, SF_SMOKE).collect()}
    events = spark.read.parquet(f"{SF_SMOKE}/events.parquet").collect()
    acc = defaultdict(lambda: [0, 0])
    for e in events:
        k = (e["event_type"], e["ts"].date())
        acc[k][0] += round(round(e["value"], 2) * 100)
        acc[k][1] += 1
    series = defaultdict(list)
    for (et, _), (c, n) in acc.items():
        series[et].append(math.floor(c / 100 / n * 100 + 0.5))
    for et, mcs in series.items():
        n = len(mcs)
        mu = sum(mcs) / n
        sd = math.sqrt(sum(round((x - mu) ** 2, 6) for x in mcs) / (n - 1))
        cp = (1.2 * mu - 0.8 * mu) / (6 * sd)
        cpk = min(1.2 * mu - mu, mu - 0.8 * mu) / (3 * sd)
        r = rows[et]
        assert abs(r["center"] - (mu / 100)) < 0.01
        assert abs(r["stddev"] - (sd / 100)) < 0.0001
        assert abs(r["cp"] - (cp)) < 1e-05
        assert abs(r["cpk"] - (cpk)) < 1e-05
        assert r["capable_4sigma"] == (cpk >= 1.33)
        # with symmetric self-centered specs Cp == Cpk
        assert abs(r["cp"] - r["cpk"]) < 1e-5


def test_trimmed_mean_matches_bruteforce(spark):
    rows = {r["c_mktsegment"]: r
            for r in QUERIES["q_trimmed_mean"].fn(spark, SF_SMOKE).collect()}
    orders = spark.read.parquet(f"{SF_SMOKE}/orders.parquet").collect()
    seg_of = {c["c_custkey"]: c["c_mktsegment"]
              for c in spark.read.parquet(f"{SF_SMOKE}/customer.parquet").collect()}
    by_seg = defaultdict(list)
    for o in orders:
        by_seg[seg_of[o["o_custkey"]]].append(round(o["o_totalprice"] * 100))
    for seg, vals in by_seg.items():
        vals.sort()
        n = len(vals)
        k = int(0.10 * n)
        mid = vals[k:n - k]
        r = rows[seg]
        assert r["n_orders"] == n
        assert r["n_trimmed_each_side"] == k
        assert abs(r["trimmed_mean"]
                   - (sum(mid) / len(mid) / 100)) < 0.001
        assert abs(r["raw_mean"] - (sum(vals) / n / 100)) < 0.001
        # trimming a right-skewed distribution pulls the mean down
        assert r["trimmed_mean"] != r["raw_mean"]

"""Wave-78 semantics: Atkinson index, binomial overdispersion."""

from __future__ import annotations

import math
from collections import defaultdict

import biosets_spark.queries.wave78 as w78  # noqa: F401  (registers the wave)
from biosets_spark.queries import QUERIES
from tests.conftest import SF_SMOKE


def test_atkinson_matches_bruteforce(spark):
    rows = {r["c_mktsegment"]: r
            for r in QUERIES["q_atkinson_index"].fn(spark, SF_SMOKE).collect()}
    orders = spark.read.parquet(f"{SF_SMOKE}/orders.parquet").collect()
    seg_of = {c["c_custkey"]: c["c_mktsegment"]
              for c in spark.read.parquet(f"{SF_SMOKE}/customer.parquet").collect()}
    by_seg = defaultdict(list)
    for o in orders:
        by_seg[seg_of[o["o_custkey"]]].append(round(o["o_totalprice"] * 100))
    for seg, vals in by_seg.items():
        n = len(vals)
        mean = sum(vals) / n
        geo = math.exp(sum(round(math.log(v), 8) for v in vals) / n)
        r = rows[seg]
        assert r["n_orders"] == n
        assert abs(r["mean_value"] - (mean / 100)) < 0.01
        assert abs(r["geo_mean_value"] - (geo / 100)) < 0.01
        assert abs(r["atkinson_eps1"] - (1 - geo / mean)) < 1e-05
        # AM-GM: the index is a proper fraction
        assert 0 <= r["atkinson_eps1"] < 1


def test_overdispersion_matches_bruteforce(spark):
    rows = {r["event_type"]: r
            for r in QUERIES["q_overdispersion"].fn(spark, SF_SMOKE).collect()}
    events = spark.read.parquet(f"{SF_SMOKE}/events.parquet").collect()
    daily = defaultdict(lambda: [0, 0])
    for e in events:
        k = (e["event_type"], e["ts"].date())
        daily[k][0] += 1
        daily[k][1] += e["value"] >= 20.0
    by_type = defaultdict(list)
    for (et, _), (n, k) in daily.items():
        by_type[et].append((n, k))
    for et, days in by_type.items():
        nt = sum(n for n, _ in days)
        kt = sum(k for _, k in days)
        p = kt / nt
        chi2 = sum(round((k - n * p) ** 2 / (n * p * (1 - p)), 8)
                   for n, k in days)
        phi = chi2 / (len(days) - 1)
        r = rows[et]
        assert r["n_days"] == len(days)
        assert abs(r["chi2"] - (chi2)) < 1e-06
        assert abs(r["dispersion_phi"] - (phi)) < 1e-06
        assert r["overdispersed"] == (phi > 1.5)
        assert r["dispersion_phi"] > 0

"""Wave-74 semantics: Theil decomposition, Jarque-Bera."""

from __future__ import annotations

import math
from collections import defaultdict

import biosets_spark.queries.wave74 as w74  # noqa: F401  (registers the wave)
from biosets_spark.queries import QUERIES
from tests.conftest import SF_SMOKE


def test_theil_decomposition_identity(spark):
    rows = {r["c_mktsegment"]: r
            for r in QUERIES["q_theil_decomposition"].fn(spark, SF_SMOKE).collect()}
    orders = spark.read.parquet(f"{SF_SMOKE}/orders.parquet").collect()
    seg_of = {c["c_custkey"]: c["c_mktsegment"]
              for c in spark.read.parquet(f"{SF_SMOKE}/customer.parquet").collect()}
    by_seg = defaultdict(list)
    for o in orders:
        by_seg[seg_of[o["o_custkey"]]].append(round(o["o_totalprice"] * 100))
    all_vals = [v for vs in by_seg.values() for v in vs]
    mu = sum(all_vals) / len(all_vals)
    st = sum(all_vals)

    def theil(vals):
        m = sum(vals) / len(vals)
        return sum(v * math.log(v) for v in vals) / sum(vals) - math.log(m)

    for seg, vals in by_seg.items():
        r = rows[seg]
        assert r["n_orders"] == len(vals)
        assert abs(r["value_share"] - (sum(vals) / st)) < 1e-06
        assert abs(r["theil_within"] - (theil(vals))) < 1e-05
        m_g = sum(vals) / len(vals)
        bt = sum(vals) / st * math.log(m_g / mu)
        assert abs(r["between_term"] - (bt)) < 1e-05
    # the decomposition identity: share-weighted within + between = global T
    t_global = theil(all_vals)
    t_rebuilt = sum(
        r["value_share"] * r["theil_within"] + r["between_term"]
        for r in rows.values()
    )
    assert abs(t_rebuilt - t_global) < 1e-4


def test_jarque_bera_matches_bruteforce(spark):
    rows = {r["event_type"]: r
            for r in QUERIES["q_jarque_bera"].fn(spark, SF_SMOKE).collect()}
    events = spark.read.parquet(f"{SF_SMOKE}/events.parquet").collect()
    acc = defaultdict(lambda: [0, 0])
    for e in events:
        k = (e["event_type"], e["ts"].date())
        acc[k][0] += round(round(e["value"], 2) * 100)
        acc[k][1] += 1
    series = defaultdict(list)
    for (et, _), (c, n) in acc.items():
        # replicate the engine op-for-op: decimal value sum -> double,
        # / count, * 100, HALF_UP round to integer cents
        series[et].append(math.floor(c / 100 / n * 100 + 0.5))
    for et, mcs in series.items():
        n = len(mcs)
        # two-pass center-then-power, mirroring both engines
        m1 = sum(mcs) / n
        m2 = sum(round((x - m1) ** 2, 6) for x in mcs) / n
        m3 = sum(round((x - m1) ** 3, 6) for x in mcs) / n
        m4 = sum(round((x - m1) ** 4, 6) for x in mcs) / n
        skew = m3 / m2 ** 1.5
        kurt = m4 / m2 ** 2 - 3
        jb = n / 6 * (skew ** 2 + kurt ** 2 / 4)
        r = rows[et]
        assert r["n_days"] == n
        assert abs(r["skewness"] - (skew)) < 1e-05
        assert abs(r["excess_kurtosis"] - (kurt)) < 1e-05
        assert abs(r["jarque_bera"] - (jb)) < 0.0001
        assert r["reject_normal_5pct"] == (jb > 5.991465)
        assert r["jarque_bera"] >= 0

"""Wave-95 semantics: CUPED adjustment, winsorization gain."""

from __future__ import annotations

import math
from collections import defaultdict

import biosets_spark.queries.wave95 as w95  # noqa: F401  (registers the wave)
from biosets_spark.queries import QUERIES
from tests.conftest import SF_SMOKE


def test_cuped_matches_bruteforce(spark):
    (row,) = QUERIES["q_cuped_adjustment"].fn(spark, SF_SMOKE).collect()
    orders = spark.read.parquet(f"{SF_SMOKE}/orders.parquet").collect()
    days = [o["o_orderdate"].toordinal() for o in orders]
    mid = (min(days) + max(days)) // 2
    cust = defaultdict(lambda: [0, 0])
    for o in orders:
        c = round(o["o_totalprice"] * 100)
        idx = 0 if o["o_orderdate"].toordinal() <= mid else 1
        cust[o["o_custkey"]][idx] += c
    xs = [v[0] for v in cust.values()]
    ys = [v[1] for v in cust.values()]
    n = len(xs)
    sx, sy = float(sum(xs)), float(sum(ys))
    sxy = float(sum(a * b for a, b in zip(xs, ys)))
    sxx = float(sum(a * a for a in xs))
    syy = float(sum(b * b for b in ys))
    cov_n = n * sxy - sx * sy
    varx_n = n * sxx - sx * sx
    vary_n = n * syy - sy * sy
    rho2 = cov_n ** 2 / (varx_n * vary_n)
    assert row["n_customers"] == n
    assert abs(row["cuped_theta"] - round(cov_n / varx_n, 6)) < 1e-5
    assert abs(row["rho_squared"] - round(rho2, 6)) < 1e-5
    assert abs(row["variance_ratio"] - round(1 - rho2, 6)) < 1e-5
    assert abs(row["effective_n_multiplier"]
               - round(1 / (1 - rho2), 6)) < 1e-4
    assert 0 <= row["rho_squared"] <= 1
    assert row["effective_n_multiplier"] >= 1


def test_winsor_gain_matches_bruteforce(spark):
    rows = {r["c_mktsegment"]: r
            for r in QUERIES["q_winsor_variance_gain"].fn(spark, SF_SMOKE).collect()}
    orders = spark.read.parquet(f"{SF_SMOKE}/orders.parquet").collect()
    seg_of = {c["c_custkey"]: c["c_mktsegment"]
              for c in spark.read.parquet(f"{SF_SMOKE}/customer.parquet").collect()}
    by_seg = defaultdict(list)
    for o in orders:
        by_seg[seg_of[o["o_custkey"]]].append(round(o["o_totalprice"] * 100))
    for seg, vals in by_seg.items():
        vals.sort()
        n = len(vals)
        # continuous p99: linear interpolation like both engines
        pos = 0.99 * (n - 1)
        lo = int(pos)
        frac = pos - lo
        p99 = vals[lo] + frac * (vals[min(lo + 1, n - 1)] - vals[lo])
        ws = [round(min(float(v), p99), 4) for v in vals]
        s1, s2 = sum(vals), sum(v * v for v in vals)
        w1 = sum(ws)
        w2 = sum(round(w * w, 4) for w in ws)
        raw_v = s2 / n - (s1 / n) ** 2
        win_v = w2 / n - (w1 / n) ** 2
        r = rows[seg]
        assert r["n_orders"] == n
        assert abs(r["raw_variance"] - round(raw_v / 10000, 2)) < 1
        assert abs(r["winsorized_variance"] - round(win_v / 10000, 2)) < 1
        assert abs(r["variance_ratio"] - round(win_v / raw_v, 6)) < 1e-4
        assert abs(r["mean_shift_frac"]
                   - round((s1 / n - w1 / n) / (s1 / n), 6)) < 1e-5
        # clamping the top tail can only shrink variance
        assert 0 < r["variance_ratio"] <= 1
        assert r["mean_shift_frac"] >= 0

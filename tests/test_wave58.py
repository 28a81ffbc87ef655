"""Wave-58 semantics: skyline operator, knee point."""

from __future__ import annotations

from collections import defaultdict

import biosets_spark.queries.wave58  # noqa: F401  (registers the wave)
from biosets_spark.queries import QUERIES
from tests.conftest import SF_SMOKE


def test_skyline_is_exactly_the_pareto_front(spark):
    rows = QUERIES["q_skyline_orders"].fn(spark, SF_SMOKE).collect()
    orders = {o["o_orderkey"]: o
              for o in spark.read.parquet(f"{SF_SMOKE}/orders.parquet").collect()}
    li = spark.read.parquet(f"{SF_SMOKE}/lineitem.parquet").collect()
    lat = {}
    for x in li:
        o = orders[x["l_orderkey"]]
        d = (x["l_shipdate"].date() - o["o_orderdate"].date()).days
        k = x["l_orderkey"]
        if k not in lat or d < lat[k]:
            lat[k] = d
    pts = defaultdict(lambda: defaultdict(lambda: [10**9, 0]))
    for k, d in lat.items():
        o = orders[k]
        price = round(o["o_totalprice"] * 100)
        cell = pts[o["o_orderpriority"]][price]
        cell[0] = min(cell[0], d)
        cell[1] += 1
    expect = {}
    for pri, by_price in pts.items():
        front = []
        for price, (d, n) in sorted(by_price.items(), reverse=True):
            # Pareto: survives iff strictly faster than every pricier point
            if all(d < fd for _, fd, _ in front):
                front.append((price, d, n))
        expect[pri] = front
    got = defaultdict(list)
    for r in rows:
        got[r["o_orderpriority"]].append(
            (r["price_cents"], r["best_latency_days"], r["n_orders"]))
    assert dict(got) == expect
    # front property: prices strictly decreasing, latencies strictly
    # decreasing along each priority's front
    for front in got.values():
        prices = [p for p, _, _ in front]
        lats = [d for _, d, _ in front]
        assert prices == sorted(prices, reverse=True)
        assert lats == sorted(lats, reverse=True)
        assert len(set(lats)) == len(lats)


def test_knee_point_is_the_argmax_gap(spark):
    rows = {r["o_orderpriority"]: r
            for r in QUERIES["q_knee_point"].fn(spark, SF_SMOKE).collect()}
    orders = spark.read.parquet(f"{SF_SMOKE}/orders.parquet").collect()
    rev = defaultdict(lambda: defaultdict(int))
    for o in orders:
        rev[o["o_orderpriority"]][o["o_custkey"]] += round(o["o_totalprice"] * 100)
    for pri, by_cust in rev.items():
        ordered = sorted(by_cust.items(), key=lambda kv: (-kv[1], kv[0]))
        tot = sum(c for _, c in ordered)
        n = len(ordered)
        cum = 0
        best = None
        for rk, (_, c) in enumerate(ordered, 1):
            cum += c
            gap = cum / tot - rk / n
            if best is None or gap > best[0] + 1e-15:
                best = (gap, rk, cum / tot)
        r = rows[pri]
        assert r["n_customers"] == n
        assert r["knee_rank"] == best[1]
        assert abs(r["max_gap"] - round(best[0], 6)) < 1e-6
        assert abs(r["revenue_share_at_knee"] - round(best[2], 6)) < 1e-6
        # at the knee, revenue share strictly exceeds customer share
        assert r["revenue_share_at_knee"] > r["knee_share_of_customers"]

"""Wave-98 semantics: Sharpe ratio, price dispersion."""

from __future__ import annotations

import math
from collections import defaultdict

import biosets_spark.queries.wave98 as w98  # noqa: F401  (registers the wave)
from biosets_spark.queries import QUERIES
from tests.conftest import SF_SMOKE


def test_sharpe_matches_bruteforce(spark):
    rows = {r["c_mktsegment"]: r
            for r in QUERIES["q_sharpe_revenue"].fn(spark, SF_SMOKE).collect()}
    orders = spark.read.parquet(f"{SF_SMOKE}/orders.parquet").collect()
    seg_of = {c["c_custkey"]: c["c_mktsegment"]
              for c in spark.read.parquet(f"{SF_SMOKE}/customer.parquet").collect()}
    daily = defaultdict(lambda: defaultdict(int))
    for o in orders:
        daily[seg_of[o["o_custkey"]]][o["o_orderdate"]] += round(
            o["o_totalprice"] * 100
        )
    for seg, days in daily.items():
        ordered = [days[d] for d in sorted(days)]
        rets = [round(math.log(b / a), 8)
                for a, b in zip(ordered, ordered[1:])]
        n = len(rets)
        s1 = sum(rets)
        s2 = sum(round(r * r, 10) for r in rets)
        mean = s1 / n
        vol = math.sqrt(s2 / n - mean ** 2)
        r = rows[seg]
        assert r["n_returns"] == n
        assert abs(r["mean_log_return"] - round(mean, 6)) < 1e-6
        assert abs(r["volatility"] - round(vol, 6)) < 1e-6
        assert abs(r["sharpe_annualized"]
                   - round(mean / vol * math.sqrt(365), 6)) < 1e-4


def test_price_dispersion_matches_bruteforce(spark):
    got = QUERIES["q_price_dispersion"].fn(spark, SF_SMOKE).collect()
    li = spark.read.parquet(f"{SF_SMOKE}/lineitem.parquet").collect()
    units = defaultdict(list)
    for x in li:
        if x["l_quantity"] > 0:
            up = round(round(x["l_extendedprice"] * 100) / x["l_quantity"], 4)
            units[x["l_partkey"]].append(up)
    scored = []
    for pk, ups in units.items():
        if len(ups) < 5:
            continue
        n = len(ups)
        s1 = sum(ups)
        s2 = sum(round(u * u, 4) for u in ups)
        mean = s1 / n
        cv = math.sqrt(s2 / n - mean ** 2) / mean
        scored.append((-cv, pk, n, mean))
    scored.sort()
    assert len(got) == 15
    for row, (ncv, pk, n, mean) in zip(got, scored[:15]):
        assert row["l_partkey"] == pk
        assert row["n_sales"] == n
        assert abs(row["mean_unit_price"] - round(mean / 100, 2)) < 1e-2
        assert abs(row["price_cv"] - round(-ncv, 6)) < 1e-5
        assert row["price_cv"] >= 0

"""Wave-94 semantics: log-rank test, restricted mean survival."""

from __future__ import annotations

import datetime
import math
from collections import defaultdict

import biosets_spark.queries.wave94 as w94  # noqa: F401  (registers the wave)
from biosets_spark.queries import QUERIES
from tests.conftest import SF_SMOKE


def _delays(spark):
    orders = {o["o_orderkey"]: (o["o_orderpriority"] == "1-URGENT",
                                o["o_orderdate"])
              for o in spark.read.parquet(f"{SF_SMOKE}/orders.parquet").collect()}
    first_ship = {}
    for x in spark.read.parquet(f"{SF_SMOKE}/lineitem.parquet").collect():
        k = x["l_orderkey"]
        d = x["l_shipdate"]
        if k not in first_ship or d < first_ship[k]:
            first_ship[k] = d
    def to_date(x):
        return x.date() if isinstance(x, datetime.datetime) else x

    out = []
    for k, ship in first_ship.items():
        urgent, odate = orders[k]
        out.append((urgent, (to_date(ship) - to_date(odate)).days))
    return out


def test_log_rank_matches_bruteforce(spark):
    (row,) = QUERIES["q_log_rank_test"].fn(spark, SF_SMOKE).collect()
    delays = _delays(spark)
    dist = defaultdict(lambda: [0, 0])
    for urgent, t in delays:
        dist[t][0] += 1
        dist[t][1] += urgent
    u = v = 0.0
    n_at = n1_at = 0
    for t in sorted(dist, reverse=True):
        d, d1 = dist[t]
        n_at += d
        n1_at += d1
        p1 = n1_at / n_at
        u += round(d1 - d * p1, 8)
        if n_at > 1:
            v += round(d * p1 * (1 - p1) * (n_at - d) / (n_at - 1), 8)
    z = u / math.sqrt(v)
    assert row["n_orders"] == len(delays)
    assert abs(row["u_stat"] - (u)) < 1e-06
    assert abs(row["z_logrank"] - (z)) < 1e-05
    assert row["differ_5pct"] == (abs(z) > 1.959964)


def test_rmst_matches_bruteforce(spark):
    rows = {r["urgent"]: r
            for r in QUERIES["q_rmst"].fn(spark, SF_SMOKE).collect()}
    groups = defaultdict(list)
    for urgent, t in _delays(spark):
        groups[urgent].append(t)
    for urgent, ts in groups.items():
        n = len(ts)
        rmst = sum(min(t, 30) for t in ts) / n
        frac = sum(1 for t in ts if t > 30) / n
        r = rows[urgent]
        assert r["n_orders"] == n
        assert abs(r["rmst_30d"] - (rmst)) < 1e-06
        assert abs(r["frac_beyond_tau"] - (frac)) < 1e-06
        # RMST is truncated at tau by construction
        assert r["rmst_30d"] <= 30

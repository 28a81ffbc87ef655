"""Wave-62 semantics: Simpson's-paradox audit, recency-decayed value."""

from __future__ import annotations

import math
from collections import defaultdict

import biosets_spark.queries.wave62 as w62  # noqa: F401  (registers the wave)
from biosets_spark.queries import QUERIES
from tests.conftest import SF_SMOKE


def test_simpson_paradox_matches_bruteforce(spark):
    (row,) = QUERIES["q_simpson_paradox"].fn(spark, SF_SMOKE).collect()
    li = spark.read.parquet(f"{SF_SMOKE}/lineitem.parquet").collect()
    orders = {o["o_orderkey"]: o["o_orderpriority"]
              for o in spark.read.parquet(f"{SF_SMOKE}/orders.parquet").collect()}
    cells = defaultdict(lambda: [0, 0])  # (stratum, exposed) -> [n, k]
    for x in li:
        key = (orders[x["l_orderkey"]], x["l_discount"] >= 0.05)
        cells[key][0] += 1
        cells[key][1] += x["l_returnflag"] == "R"

    def diff(keys):
        en = sum(cells[k][0] for k in keys if k[1])
        ek = sum(cells[k][1] for k in keys if k[1])
        un = sum(cells[k][0] for k in keys if not k[1])
        uk = sum(cells[k][1] for k in keys if not k[1])
        return ek / en - uk / un

    strata = sorted({s for s, _ in cells})
    pooled = diff(list(cells))
    diffs = {s: diff([k for k in cells if k[0] == s]) for s in strata}
    n_rev = sum(1 for d in diffs.values()
                if d != 0 and math.copysign(1, d) == -math.copysign(1, pooled))
    assert abs(row["pooled_diff"] - (pooled)) < 1e-06
    assert row["n_strata"] == len(strata)
    assert row["n_reversed"] == n_rev
    assert abs(row["min_stratum_diff"] - (min(diffs.values()))) < 1e-06
    assert abs(row["max_stratum_diff"] - (max(diffs.values()))) < 1e-06
    assert row["full_reversal"] == (n_rev == len(strata))


def test_recency_value_matches_bruteforce(spark):
    rows = {r["c_mktsegment"]: r
            for r in QUERIES["q_recency_value"].fn(spark, SF_SMOKE).collect()}
    orders = spark.read.parquet(f"{SF_SMOKE}/orders.parquet").collect()
    seg = {c["c_custkey"]: c["c_mktsegment"]
           for c in spark.read.parquet(f"{SF_SMOKE}/customer.parquet").collect()}
    d0 = max(o["o_orderdate"] for o in orders)
    ln2, hl = 0.6931471805599453, 180
    acc = defaultdict(lambda: [0, 0, 0.0])  # seg -> [n, cents, decayed]
    for o in orders:
        s = seg[o["o_custkey"]]
        age = (d0 - o["o_orderdate"]).days
        acc[s][0] += 1
        acc[s][1] += round(o["o_totalprice"] * 100)
        acc[s][2] += round(math.exp(-age * ln2 / hl) * o["o_totalprice"], 6)
    for s, (n, cents, dec) in acc.items():
        r = rows[s]
        assert r["n_orders"] == n
        assert abs(r["lifetime_value"] - cents / 100) < 1e-6
        assert abs(r["decayed_value"] - dec) < 1e-4
        assert abs(r["recency_ratio"] - (dec / (cents / 100))) < 1e-06
        # decay only shrinks
        assert 0 < r["recency_ratio"] < 1

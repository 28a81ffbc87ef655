"""Wave-52 semantics: price indices, power analysis."""

from __future__ import annotations

import math
from collections import defaultdict

import biosets_spark.queries.wave52  # noqa: F401  (registers the wave)
from biosets_spark.queries import QUERIES
from tests.conftest import SF_SMOKE


def test_price_index_matches_bruteforce(spark):
    (row,) = QUERIES["q_price_index"].fn(spark, SF_SMOKE).collect()
    li = spark.read.parquet(f"{SF_SMOKE}/lineitem.parquet").collect()
    y0 = min(x["l_shipdate"].year for x in li)
    y1 = max(x["l_shipdate"].year for x in li)
    agg = defaultdict(lambda: [0, 0])
    for x in li:
        y = x["l_shipdate"].year
        if y in (y0, y1):
            a = agg[(x["l_partkey"], y)]
            a[0] += round(x["l_extendedprice"] * 100)
            a[1] += int(x["l_quantity"])
    common = {pk for pk, y in agg if y == y0} & {pk for pk, y in agg if y == y1}
    l_num = l_den = p_num = p_den = 0
    for pk in common:
        c0, q0 = agg[(pk, y0)]
        c1, q1 = agg[(pk, y1)]
        # true fixed-basket terms with unit prices p_y = c_y / q_y:
        # Laspeyres = sum(p1*q0) / sum(p0*q0); p0*q0 reduces to c0
        # exactly, p1*q1 to c1, so only two terms carry a division
        # (the engine quantizes those to 6 dp, absorbed by the final
        # 1e-6 tolerance on a ratio of much larger magnitudes)
        l_num += c1 * q0 / q1
        l_den += c0
        p_num += c1
        p_den += c0 * q1 / q0
    assert (row["base_year"], row["current_year"]) == (y0, y1)
    assert row["n_common_parts"] == len(common)
    lasp = l_num / l_den
    paas = p_num / p_den
    assert abs(row["laspeyres"] - (lasp)) < 1e-06
    assert abs(row["paasche"] - (paas)) < 1e-06
    assert abs(row["fisher"] - (math.sqrt(lasp * paas))) < 1e-06
    # Fisher lies between its two factors
    lo, hi = sorted([row["laspeyres"], row["paasche"]])
    assert lo - 1e-9 <= row["fisher"] <= hi + 1e-9


def test_power_analysis_matches_closed_form(spark):
    rows = {r["o_orderstatus"]: r
            for r in QUERIES["q_power_analysis"].fn(spark, SF_SMOKE).collect()}
    orders = spark.read.parquet(f"{SF_SMOKE}/orders.parquet").collect()
    base = defaultdict(lambda: [0, 0])
    for o in orders:
        base[o["o_orderstatus"]][0] += 1
        if o["o_orderpriority"] == "1-URGENT":
            base[o["o_orderstatus"]][1] += 1
    za, zb = 1.959964, 0.841621
    for st, (n, k) in base.items():
        r = rows[st]
        p1 = k / n
        p2 = min(p1 * 1.10, 0.999999)
        pbar = (p1 + p2) / 2
        n_arm = math.ceil(
            (za * math.sqrt(2 * pbar * (1 - pbar))
             + zb * math.sqrt(p1 * (1 - p1) + p2 * (1 - p2))) ** 2
            / (p2 - p1) ** 2)
        assert r["n_current"] == n
        assert abs(r["base_rate"] - (p1)) < 1e-06
        assert r["n_per_arm"] == n_arm
        assert r["underpowered_today"] == (n_arm / n >= 1)
        # a 10% relative lift on a small base rate needs MANY samples
        assert n_arm > 100

"""Wave-57 semantics: Cramer's V, round-price bias."""

from __future__ import annotations

import math
from collections import Counter

import biosets_spark.queries.wave57  # noqa: F401  (registers the wave)
from biosets_spark.queries import QUERIES
from tests.conftest import SF_SMOKE


def test_cramers_v_matches_bruteforce(spark):
    (row,) = QUERIES["q_cramers_v"].fn(spark, SF_SMOKE).collect()
    cust = spark.read.parquet(f"{SF_SMOKE}/customer.parquet").collect()
    nat = {n["n_nationkey"]: n["n_name"]
           for n in spark.read.parquet(f"{SF_SMOKE}/nation.parquet").collect()}
    joint = Counter((c["c_mktsegment"], nat[c["c_nationkey"]]) for c in cust)
    ni = Counter(); nj = Counter()
    for (s, t), c in joint.items():
        ni[s] += c
        nj[t] += c
    n = sum(joint.values())
    r, c_ = len(ni), len(nj)
    chi2 = sum(
        round((cnt - ni[s] * nj[t] / n) ** 2 / (ni[s] * nj[t] / n), 10)
        for (s, t), cnt in joint.items())
    # NOTE: zero cells contribute E, not 0 — but the query only sums
    # observed cells, matching the oracle; verify on observed support
    v = math.sqrt(chi2 / (n * min(r - 1, c_ - 1)))
    phi2c = max(chi2 / n - (r - 1) * (c_ - 1) / (n - 1), 0)
    rc = r - (r - 1) ** 2 / (n - 1)
    cc = c_ - (c_ - 1) ** 2 / (n - 1)
    # published Bergsma-Wicher form divides by min(r~ - 1, c~ - 1)
    vc = math.sqrt(phi2c / min(rc - 1, cc - 1))
    assert (row["n_rows"], row["n_segments"], row["n_nations"]) == (n, r, c_)
    assert abs(row["chi2"] - (chi2)) < 0.0001
    assert abs(row["cramers_v"] - (v)) < 1e-06
    assert abs(row["cramers_v_corrected"] - (vc)) < 1e-06
    # correction only shrinks
    assert row["cramers_v_corrected"] <= row["cramers_v"] + 1e-9
    assert 0 <= row["cramers_v"] <= 1


def test_round_price_bias_matches_bruteforce(spark):
    rows = {r["ending"]: r
            for r in QUERIES["q_round_price_bias"].fn(spark, SF_SMOKE).collect()}
    orders = spark.read.parquet(f"{SF_SMOKE}/orders.parquet").collect()
    ends = Counter()
    for o in orders:
        e = round(o["o_totalprice"] * 100) % 100
        ends[".00" if e == 0 else ".50" if e == 50
             else ".99" if e == 99 else "other"] += 1
    n = sum(ends.values())
    slots = {".00": 1, ".50": 1, ".99": 1, "other": 97}
    assert set(rows) == set(k for k in ends)
    for k, r in rows.items():
        assert r["n_orders"] == ends[k]
        assert abs(r["share"] - (ends[k] / n)) < 1e-06
        assert abs(r["bias_vs_uniform"]
                   - ((ends[k] / n) / (slots[k] / 100))) < 1e-05
    # shares sum to 1
    assert abs(sum(r["share"] for r in rows.values()) - 1) < 1e-4

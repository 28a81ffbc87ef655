"""Wave-97 semantics: covariate balance SMD, E-value."""

from __future__ import annotations

import math
from collections import defaultdict

import biosets_spark.queries.wave97 as w97  # noqa: F401  (registers the wave)
from biosets_spark.queries import QUERIES
from tests.conftest import SF_SMOKE


def test_covariate_balance_matches_bruteforce(spark):
    rows = {r["covariate"]: r
            for r in QUERIES["q_covariate_balance"].fn(spark, SF_SMOKE).collect()}
    li = spark.read.parquet(f"{SF_SMOKE}/lineitem.parquet").collect()
    feats = defaultdict(lambda: defaultdict(list))
    for x in li:
        e = x["l_discount"] >= 0.05
        feats["quantity"][e].append(int(x["l_quantity"]))
        feats["tax_bp"][e].append(round(x["l_tax"] * 10000))
    for name, groups in feats.items():
        out = {}
        for e, vals in groups.items():
            n = len(vals)
            s1 = sum(vals)
            s2 = sum(v * v for v in vals)
            out[e] = (s1 / n, (s2 - s1 * s1 / n) / (n - 1))
        m1, v1 = out[True]
        m0, v0 = out[False]
        smd = (m1 - m0) / math.sqrt((v1 + v0) / 2)
        r = rows[name]
        assert abs(r["mean_exposed"] - round(m1, 4)) < 1e-3
        assert abs(r["mean_unexposed"] - round(m0, 4)) < 1e-3
        assert abs(r["smd"] - round(smd, 6)) < 1e-5
        assert r["balanced"] == (abs(smd) < 0.1)
    assert set(rows) == {"quantity", "tax_bp"}


def test_e_value_matches_bruteforce(spark):
    (row,) = QUERIES["q_e_value"].fn(spark, SF_SMOKE).collect()
    li = spark.read.parquet(f"{SF_SMOKE}/lineitem.parquet").collect()
    a = b = c = d = 0
    for x in li:
        e = x["l_discount"] >= 0.05
        r = x["l_returnflag"] == "R"
        a += e and r
        b += e and not r
        c += (not e) and r
        d += (not e) and not r
    rr = (a / (a + b)) / (c / (c + d))
    se = math.sqrt(1 / a - 1 / (a + b) + 1 / c - 1 / (c + d))
    rr_lo = math.exp(math.log(rr) - 1.959964 * se)

    def ev(x):
        return x + math.sqrt(x * (x - 1)) if x >= 1 \
            else 1 / x + math.sqrt((1 / x) * (1 / x - 1))

    assert abs(row["risk_ratio"] - round(rr, 6)) < 1e-6
    assert abs(row["rr_ci_lower"] - round(rr_lo, 6)) < 1e-5
    assert abs(row["e_value_point"] - round(ev(rr), 6)) < 1e-5
    expected_ci = ev(rr_lo) if rr_lo >= 1 else 1.0
    assert abs(row["e_value_ci"] - round(expected_ci, 6)) < 1e-5
    # the E-value is never below 1 and never below the RR itself
    assert row["e_value_point"] >= max(row["risk_ratio"], 1) - 1e-9 \
        or row["risk_ratio"] < 1

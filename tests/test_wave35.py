"""Wave-35 semantics: Benford digit audit, mutual information."""

from __future__ import annotations

import math
from collections import Counter

import biosets_spark.queries.wave35  # noqa: F401  (registers the wave)
from biosets_spark.queries import QUERIES
from tests.conftest import SF_SMOKE


def test_benford_matches_bruteforce(spark):
    rows = {r["digit"]: r
            for r in QUERIES["q_benford_digits"].fn(spark, SF_SMOKE).collect()}
    orders = spark.read.parquet(f"{SF_SMOKE}/orders.parquet").collect()
    digits = Counter(int(str(round(o["o_totalprice"] * 100))[0]) for o in orders)
    assert set(rows) == set(digits)
    n = sum(digits.values())
    for d, row in rows.items():
        assert row["n_orders"] == digits[d]
        assert abs(row["obs_share"] - round(digits[d] / n, 6)) < 1e-6
        e = math.log10(1 + 1 / d)
        assert abs(row["benford_share"] - round(e, 6)) < 1e-6
        assert abs(row["chi2_term"]
                   - round((digits[d] - n * e) ** 2 / (n * e), 6)) < 1e-4
    # shares sum to 1
    assert abs(sum(r["obs_share"] for r in rows.values()) - 1) < 1e-4


def test_mutual_information_matches_bruteforce(spark):
    rows = {r["c_mktsegment"]: r
            for r in QUERIES["q_mutual_information"].fn(spark, SF_SMOKE).collect()}
    cust = spark.read.parquet(f"{SF_SMOKE}/customer.parquet").collect()
    nat = {r["n_nationkey"]: r["n_name"]
           for r in spark.read.parquet(f"{SF_SMOKE}/nation.parquet").collect()}
    joint = Counter((c["c_mktsegment"], nat[c["c_nationkey"]]) for c in cust)
    ni = Counter(); nj = Counter()
    for (s, t), c in joint.items():
        ni[s] += c
        nj[t] += c
    n = sum(joint.values())
    total_mi = 0.0
    for seg, row in rows.items():
        assert row["n_customers"] == ni[seg]
        assert row["n_nations"] == len([1 for (s, _) in joint if s == seg])
        contrib = sum(
            c / n * math.log(c * n / (ni[s] * nj[t]))
            for (s, t), c in joint.items() if s == seg
        )
        assert abs(row["mi_contrib"] - round(contrib, 6)) < 1e-5
        total_mi += contrib
    # MI of the full table is non-negative (per-segment terms may dip
    # below zero individually)
    assert total_mi >= -1e-9

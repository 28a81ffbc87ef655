"""Wave-55 semantics: stratified effect, one-way ANOVA."""

from __future__ import annotations

from collections import defaultdict

import biosets_spark.queries.wave55  # noqa: F401  (registers the wave)
from biosets_spark.queries import QUERIES
from tests.conftest import SF_SMOKE


def test_stratified_effect_matches_bruteforce(spark):
    (row,) = QUERIES["q_stratified_effect"].fn(spark, SF_SMOKE).collect()
    li = spark.read.parquet(f"{SF_SMOKE}/lineitem.parquet").collect()
    brand = {p["p_partkey"]: p["p_brand"]
             for p in spark.read.parquet(f"{SF_SMOKE}/part.parquet").collect()}
    per = defaultdict(lambda: [0, 0, 0, 0])  # n1, n0, s1, s0
    for x in li:
        st = brand[x["l_partkey"]]
        y = int(x["l_quantity"])
        if x["l_discount"] > 0.05:
            per[st][0] += 1
            per[st][2] += y
        else:
            per[st][1] += 1
            per[st][3] += y
    n1 = n0 = s1 = s0 = 0
    num = den = 0.0
    n_strata = 0
    for st, (a, b, sa, sb) in per.items():
        if a and b:
            n_strata += 1
            n1 += a
            n0 += b
            s1 += sa
            s0 += sb
            w = a * b / (a + b)
            num += round((sa / a - sb / b) * w, 12)
            den += w
    assert row["n_strata"] == n_strata
    assert (row["n_treated"], row["n_control"]) == (n1, n0)
    assert abs(row["unadjusted_effect"] - round(s1 / n1 - s0 / n0, 6)) < 1e-6
    assert abs(row["stratified_effect"] - round(num / den, 6)) < 1e-5


def test_anova_matches_bruteforce(spark):
    rows = {r["event_type"]: r
            for r in QUERIES["q_anova_oneway"].fn(spark, SF_SMOKE).collect()}
    ev = spark.read.parquet(f"{SF_SMOKE}/events.parquet").collect()
    per = defaultdict(lambda: defaultdict(list))
    for e in ev:
        per[e["event_type"]][e["ts"].date().isoweekday()].append(
            round(e["value"] * 100))
    for t, groups in per.items():
        r = rows[t]
        k = len(groups)
        n_tot = sum(len(v) for v in groups.values())
        gm = sum(sum(v) for v in groups.values()) / n_tot
        ssb = sum(round(len(v) * (sum(v) / len(v) - gm) ** 2, 6)
                  for v in groups.values())
        ssw = sum(round(sum(x * x for x in v) - sum(v) ** 2 / len(v), 6)
                  for v in groups.values())
        assert (r["n_groups"], r["n_rows"]) == (k, n_tot)
        assert abs(r["eta_squared"] - round(ssb / (ssb + ssw), 6)) < 1e-6
        f = (ssb / (k - 1)) / (ssw / (n_tot - k))
        assert abs(r["f_stat"] - round(f, 6)) < 1e-4
        assert 0 <= r["eta_squared"] <= 1
        assert r["f_stat"] >= 0

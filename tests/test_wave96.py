"""Wave-96 semantics: EB shrinkage, Kish effective sample size."""

from __future__ import annotations

import math
from collections import Counter, defaultdict

import biosets_spark.queries.wave96 as w96  # noqa: F401  (registers the wave)
from biosets_spark.queries import QUERIES
from tests.conftest import SF_SMOKE


def test_eb_shrinkage_matches_bruteforce(spark):
    rows = {r["c_mktsegment"]: r
            for r in QUERIES["q_eb_shrinkage"].fn(spark, SF_SMOKE).collect()}
    orders = spark.read.parquet(f"{SF_SMOKE}/orders.parquet").collect()
    seg_of = {c["c_custkey"]: c["c_mktsegment"]
              for c in spark.read.parquet(f"{SF_SMOKE}/customer.parquet").collect()}
    by_seg = defaultdict(list)
    for o in orders:
        by_seg[seg_of[o["o_custkey"]]].append(round(o["o_totalprice"] * 100))
    stats = {}
    for seg, vals in by_seg.items():
        n = len(vals)
        s1 = sum(vals)
        s2 = sum(v * v for v in vals)
        m = s1 / n
        se2 = (s2 - s1 * s1 / n) / (n - 1) / n
        stats[seg] = (n, m, se2)
    k = len(stats)
    grand = sum(round(m, 6) for _, m, _ in stats.values()) / k
    mean_se2 = sum(round(se2, 6) for _, _, se2 in stats.values()) / k
    tau2 = max(
        sum(round((m - grand) ** 2, 6) for _, m, _ in stats.values())
        / (k - 1) - mean_se2, 0,
    )
    for seg, (n, m, se2) in stats.items():
        w = tau2 / (tau2 + se2)
        shrunk = w * m + (1 - w) * grand
        r = rows[seg]
        assert r["n_orders"] == n
        assert abs(r["raw_mean"] - (m / 100)) < 0.01
        assert abs(r["shrink_weight"] - (w)) < 1e-05
        assert abs(r["shrunk_mean"] - (shrunk / 100)) < 0.1
        # shrunk mean lies between raw and grand
        lo, hi = sorted([m, grand])
        assert lo / 100 - 0.02 <= r["shrunk_mean"] <= hi / 100 + 0.02
        assert 0 <= r["shrink_weight"] <= 1


def test_kish_ess_matches_bruteforce(spark):
    (row,) = QUERIES["q_kish_ess"].fn(spark, SF_SMOKE).collect()
    docs = spark.read.parquet(f"{SF_SMOKE}/documents.parquet").collect()
    counts = Counter(d["source"] for d in docs)
    sw = sw2 = 0.0
    nt = sum(counts.values())
    for n in counts.values():
        wq = round(n ** 0.7, 8)
        wd = wq / n
        sw += round(wd * n, 8)
        sw2 += round(wd * wd * n, 10)
    ess = sw * sw / sw2
    assert row["n_docs"] == nt
    assert abs(row["kish_ess"] - (ess)) < 0.2
    assert abs(row["ess_fraction"] - (ess / nt)) < 1e-05
    # weighting can only lose effective sample
    assert 0 < row["ess_fraction"] <= 1

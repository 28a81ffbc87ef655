"""Wave-90 semantics: Neyman allocation, mixture gap."""

from __future__ import annotations

import math
from collections import Counter, defaultdict

import biosets_spark.queries.wave90 as w90  # noqa: F401  (registers the wave)
from biosets_spark.queries import QUERIES
from tests.conftest import SF_SMOKE


def test_neyman_matches_bruteforce(spark):
    rows = {r["c_mktsegment"]: r
            for r in QUERIES["q_neyman_allocation"].fn(spark, SF_SMOKE).collect()}
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
        sd = math.sqrt((s2 - s1 * s1 / n) / (n - 1))
        stats[seg] = (n, sd)
    nt = sum(n for n, _ in stats.values())
    sns = sum(round(n * sd, 4) for n, sd in stats.values())
    for seg, (n, sd) in stats.items():
        r = rows[seg]
        assert r["stratum_size"] == n
        assert abs(r["stratum_sd"] - round(sd / 100, 2)) < 1e-2
        assert r["neyman_n"] == round(10000 * n * sd / sns)
        assert r["proportional_n"] == round(10000 * n / nt)
        assert abs(r["share_shift"]
                   - round(n * sd / sns - n / nt, 6)) < 1e-5
    # allocations hit the budget up to per-stratum rounding
    assert abs(sum(r["neyman_n"] for r in rows.values()) - 10000) <= 3


def test_mixture_gap_matches_bruteforce(spark):
    rows = {r["lang"]: r
            for r in QUERIES["q_mixture_gap"].fn(spark, SF_SMOKE).collect()}
    docs = spark.read.parquet(f"{SF_SMOKE}/documents.parquet").collect()
    counts = Counter(d["lang"] for d in docs)
    nt = sum(counts.values())
    k = len(counts)
    kl = sum(round((1 / k) * math.log((1 / k) / (n / nt)), 10)
             for n in counts.values())
    for lang, n in counts.items():
        r = rows[lang]
        assert r["n_docs"] == n
        assert abs(r["current_share"] - round(n / nt, 6)) < 1e-9
        assert abs(r["target_share"] - round(1 / k, 6)) < 1e-9
        assert abs(r["resample_factor"]
                   - round((1 / k) / (n / nt), 6)) < 1e-6
        assert abs(r["kl_gap_total"] - round(kl, 6)) < 1e-6
    # KL is non-negative and shared across rows
    assert len({r["kl_gap_total"] for r in rows.values()}) == 1
    assert next(iter(rows.values()))["kl_gap_total"] >= 0

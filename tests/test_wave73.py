"""Wave-73 semantics: Cochran's Q, Friedman test."""

from __future__ import annotations

import re
from collections import defaultdict

import biosets_spark.queries.wave73 as w73  # noqa: F401  (registers the wave)
from biosets_spark.queries import QUERIES
from tests.conftest import SF_SMOKE


def test_cochran_q_matches_bruteforce(spark):
    (row,) = QUERIES["q_cochran_q"].fn(spark, SF_SMOKE).collect()
    docs = spark.read.parquet(f"{SF_SMOKE}/documents.parquet").collect()
    stop = re.compile(r"\b(the|a|of|and|to|in|is|it|that|for)\b")
    g = [0, 0, 0]
    sl = sl2 = n = 0
    for d in docs:
        t = d["text"]
        truth = d["lang"] == "en"
        pa = bool(stop.search(t))
        ascii_n = len(re.sub(r"[^ -~]", "", t))
        pb = ascii_n / max(len(t), 1) > 0.95
        low = t.lower()
        vow = len(re.sub(r"[^aeiou]", "", low))
        let = len(re.sub(r"[^a-z]", "", low))
        vr = vow / max(let, 1)
        pc = 0.35 <= vr <= 0.45
        xs = [pa == truth, pb == truth, pc == truth]
        li = sum(xs)
        for i, x in enumerate(xs):
            g[i] += x
        sl += li
        sl2 += li * li
        n += 1
    mg = sl / 3
    q = 6 * sum((gi - mg) ** 2 for gi in g) / (3 * sl - sl2)
    assert row["n_docs"] == n
    assert (row["correct_stopword"], row["correct_ascii"],
            row["correct_vowel"]) == tuple(g)
    assert abs(row["cochran_q"] - round(q, 6)) < 1e-6
    assert row["cochran_q"] >= 0


def test_friedman_matches_bruteforce(spark):
    rows = {r["event_type"]: r
            for r in QUERIES["q_friedman_test"].fn(spark, SF_SMOKE).collect()}
    events = spark.read.parquet(f"{SF_SMOKE}/events.parquet").collect()
    acc = defaultdict(lambda: [0, 0])
    for e in events:
        k = (e["event_type"], e["ts"].date())
        acc[k][0] += round(round(e["value"], 2) * 100)
        acc[k][1] += 1
    by_day = defaultdict(dict)
    for (et, day), (c, nn) in acc.items():
        by_day[day][et] = round(c / 100 / nn, 6)
    rsum = defaultdict(float)
    ndays = defaultdict(int)
    for day, ms in by_day.items():
        vals = sorted(ms.values())
        for et, m in ms.items():
            lo = 1 + sum(1 for v in vals if v < m)
            ties = sum(1 for v in vals if v == m)
            rsum[et] += lo + (ties - 1) / 2
            ndays[et] += 1
    k = len(rsum)
    n = max(ndays.values())
    chi2 = 12 / (n * k * (k + 1)) * sum(v * v for v in rsum.values()) \
        - 3 * n * (k + 1)
    for et in rsum:
        r = rows[et]
        assert r["n_days"] == ndays[et]
        assert abs(r["mean_rank"] - round(rsum[et] / ndays[et], 6)) < 1e-6
        assert abs(r["friedman_chi2"] - round(chi2, 6)) < 1e-5
        assert 1 <= r["mean_rank"] <= k

"""Wave-84 semantics: Fleiss' kappa, ICC(1) reliability."""

from __future__ import annotations

import datetime
import math
import re
from collections import defaultdict

import biosets_spark.queries.wave84 as w84  # noqa: F401  (registers the wave)
from biosets_spark.queries import QUERIES
from tests.conftest import SF_SMOKE


def test_fleiss_kappa_matches_bruteforce(spark):
    (row,) = QUERIES["q_fleiss_kappa"].fn(spark, SF_SMOKE).collect()
    docs = spark.read.parquet(f"{SF_SMOKE}/documents.parquet").collect()
    stop = re.compile(r"\b(the|a|of|and|to|in|is|it|that|for)\b")
    n = 0
    sum_pi = 0.0
    sum_yes = 0
    for d in docs:
        t = d["text"]
        pa = bool(stop.search(t))
        pb = len(re.sub(r"[^ -~]", "", t)) / max(len(t), 1) > 0.95
        low = t.lower()
        vow = len(re.sub(r"[^aeiou]", "", low))
        let = len(re.sub(r"[^a-z]", "", low))
        pc = 0.35 <= vow / max(let, 1) <= 0.45
        ny = pa + pb + pc
        sum_pi += round((ny * (ny - 1) + (3 - ny) * (2 - ny)) / 6, 10)
        sum_yes += ny
        n += 1
    p_bar = sum_pi / n
    p_yes = sum_yes / (3 * n)
    pe = p_yes ** 2 + (1 - p_yes) ** 2
    kappa = (p_bar - pe) / (1 - pe)
    assert row["n_docs"] == n
    assert abs(row["share_yes"] - (p_yes)) < 1e-06
    assert abs(row["observed_agreement"] - (p_bar)) < 1e-06
    assert abs(row["fleiss_kappa"] - (kappa)) < 1e-05
    assert -1 <= row["fleiss_kappa"] <= 1


def test_icc_matches_bruteforce(spark):
    (row,) = QUERIES["q_icc_reliability"].fn(spark, SF_SMOKE).collect()
    events = spark.read.parquet(f"{SF_SMOKE}/events.parquet").collect()
    acc = defaultdict(lambda: [0, 0])
    for e in events:
        day = e["ts"].date()
        acc[day][0] += round(round(e["value"], 2) * 100)
        acc[day][1] += 1
    anchor = datetime.date(2024, 1, 1)
    weeks = defaultdict(list)
    for day, (c, nn) in acc.items():
        mc = math.floor(c / 100 / nn * 100 + 0.5)
        weeks[(day - anchor).days // 7].append(mc)
    groups = [v for v in weeks.values() if len(v) == 7]
    k = len(groups)
    nt = sum(len(g) for g in groups)
    grand = sum(sum(g) for g in groups) / nt
    ssb = sum(round(len(g) * (sum(g) / len(g) - grand) ** 2, 6)
              for g in groups)
    ssw = sum(round((x - sum(g) / len(g)) ** 2, 6)
              for g in groups for x in g)
    msb = ssb / (k - 1)
    msw = ssw / (nt - k)
    icc = (msb - msw) / (msb + 6 * msw)
    assert row["n_weeks"] == k
    assert row["n_days"] == nt
    assert abs(row["ms_between"] - (msb)) < 0.0001
    assert abs(row["ms_within"] - (msw)) < 0.0001
    assert abs(row["icc1"] - (icc)) < 1e-05
    assert -1 <= row["icc1"] <= 1

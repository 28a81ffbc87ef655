"""Wave-79 semantics: Dunning LLR collocations, TOST equivalence."""

from __future__ import annotations

import math
import re
from collections import Counter, defaultdict

import biosets_spark.queries.wave79 as w79  # noqa: F401  (registers the wave)
from biosets_spark.queries import QUERIES
from tests.conftest import SF_SMOKE

_WS = re.compile(r"[ \t\n\x0b\f\r]+")


def test_collocation_llr_matches_bruteforce(spark):
    got = QUERIES["q_collocation_llr"].fn(spark, SF_SMOKE).collect()
    docs = spark.read.parquet(f"{SF_SMOKE}/documents.parquet").collect()
    bg = Counter()
    for d in docs:
        toks = [t for t in _WS.split(d["text"].strip()) if t]
        for i in range(len(toks) - 1):
            bg[(toks[i], toks[i + 1])] += 1
    nn = sum(bg.values())
    c1 = Counter()
    c2 = Counter()
    for (w1, w2), n in bg.items():
        c1[w1] += n
        c2[w2] += n
    scored = []
    for (w1, w2), o11 in bg.items():
        if o11 < 30:
            continue
        o12 = c1[w1] - o11
        o21 = c2[w2] - o11
        o22 = nn - c1[w1] - c2[w2] + o11

        def t(o, en, ed):
            return round(o * math.log(o * nn / (en * ed)), 6) if o > 0 else 0

        llr = 2 * (t(o11, c1[w1], c2[w2]) + t(o12, c1[w1], nn - c2[w2])
                   + t(o21, nn - c1[w1], c2[w2])
                   + t(o22, nn - c1[w1], nn - c2[w2]))
        scored.append((-llr, w1, w2, o11))
    scored.sort()
    assert len(got) == 20
    for row, (nl, w1, w2, o11) in zip(got, scored[:20]):
        assert (row["w1"], row["w2"]) == (w1, w2)
        assert row["pair_count"] == o11
        assert abs(row["g2_llr"] - round(-nl, 4)) < 1e-3
        # G2 is non-negative up to quantization
        assert row["g2_llr"] > -1e-6


def test_tost_matches_bruteforce(spark):
    rows = {r["event_type"]: r
            for r in QUERIES["q_tost_equivalence"].fn(spark, SF_SMOKE).collect()}
    events = spark.read.parquet(f"{SF_SMOKE}/events.parquet").collect()
    acc = defaultdict(lambda: [0, 0])
    for e in events:
        k = (e["event_type"], e["ts"].date())
        acc[k][0] += round(round(e["value"], 2) * 100)
        acc[k][1] += 1
    daily = defaultdict(list)
    days = set()
    for (et, day), (c, n) in acc.items():
        daily[et].append((day, math.floor(c / 100 / n * 100 + 0.5)))
        days.add(day)
    d0 = min(days).toordinal()
    d1 = max(days).toordinal()
    mid = (d0 + d1) // 2
    for et, pts in daily.items():
        e_half = [m for d, m in pts if d.toordinal() <= mid]
        l_half = [m for d, m in pts if d.toordinal() > mid]
        n1, n2 = len(e_half), len(l_half)
        m1 = sum(e_half) / n1
        m2 = sum(l_half) / n2
        v1 = (sum(x * x for x in e_half) - sum(e_half) ** 2 / n1) / (n1 - 1)
        v2 = (sum(x * x for x in l_half) - sum(l_half) ** 2 / n2) / (n2 - 1)
        se = math.sqrt(v1 / n1 + v2 / n2)
        margin = 0.10 * (m1 + m2) / 2
        t_lo = ((m2 - m1) + margin) / se
        t_hi = (margin - (m2 - m1)) / se
        r = rows[et]
        assert abs(r["mean_diff"] - round((m2 - m1) / 100, 4)) < 1e-3
        assert abs(r["margin"] - round(margin / 100, 4)) < 1e-3
        assert abs(r["t_lower"] - round(t_lo, 6)) < 1e-4
        assert abs(r["t_upper"] - round(t_hi, 6)) < 1e-4
        assert r["equivalent_5pct"] == (t_lo > 1.703 and t_hi > 1.703)

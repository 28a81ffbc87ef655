"""Wave-71 semantics: JS divergence, SPRT monitor."""

from __future__ import annotations

import datetime
import math
import re
from collections import Counter, defaultdict

import biosets_spark.queries.wave71 as w71  # noqa: F401  (registers the wave)
from biosets_spark.queries import QUERIES
from tests.conftest import SF_SMOKE

_WS = re.compile(r"[ \t\n\x0b\f\r]+")


def test_js_divergence_matches_bruteforce(spark):
    got = QUERIES["q_js_divergence"].fn(spark, SF_SMOKE).collect()
    docs = spark.read.parquet(f"{SF_SMOKE}/documents.parquet").collect()
    cnt = defaultdict(Counter)
    for d in docs:
        cnt[d["source"]].update(t for t in _WS.split(d["text"].strip()) if t)
    tot = {s: sum(c.values()) for s, c in cnt.items()}
    srcs = sorted(cnt)
    scored = []
    for i, a in enumerate(srcs):
        for b in srcs[i + 1:]:
            js = 0.0
            for w in set(cnt[a]) | set(cnt[b]):
                p = cnt[a].get(w, 0) / tot[a]
                q = cnt[b].get(w, 0) / tot[b]
                m = (p + q) / 2
                if p:
                    js += 0.5 * p * math.log(p / m)
                if q:
                    js += 0.5 * q * math.log(q / m)
            scored.append((js, a, b))
    scored.sort()
    assert len(got) == 10
    for row, (js, a, b) in zip(got, scored[:10]):
        assert (row["source_a"], row["source_b"]) == (a, b)
        assert abs(row["js_divergence"] - js) < 1e-4
        # JS is bounded by ln 2
        assert 0 <= row["js_divergence"] <= math.log(2) + 1e-9


def test_sprt_monitor_matches_bruteforce(spark):
    rows = {r["event_type"]: r
            for r in QUERIES["q_sprt_monitor"].fn(spark, SF_SMOKE).collect()}
    events = spark.read.parquet(f"{SF_SMOKE}/events.parquet").collect()
    daily = defaultdict(lambda: [0, 0])
    for e in events:
        k = (e["event_type"], e["ts"].date())
        daily[k][0] += 1
        daily[k][1] += e["value"] >= 20.0
    cutoff = datetime.date(2024, 1, 8)
    series = defaultdict(list)
    base = defaultdict(lambda: [0, 0])
    for (et, day), (n, k) in daily.items():
        if day < cutoff:
            base[et][0] += n
            base[et][1] += k
        else:
            series[et].append((day, n, k))
    A = math.log(19)
    for et, pts in series.items():
        p0 = base[et][1] / base[et][0]
        p1 = min(p0 * 1.2, 0.999999)
        pts.sort()
        cum = 0.0
        cs = []
        for day, n, k in pts:
            cum += round(k * math.log(p1 / p0)
                         + (n - k) * math.log((1 - p1) / (1 - p0)), 8)
            cs.append((day, cum))
        r = rows[et]
        assert abs(r["baseline_rate"] - (p0)) < 1e-06
        assert abs(r["final_llr"] - (cs[-1][1])) < 1e-06
        assert abs(r["max_llr"] - (max(c for _, c in cs))) < 1e-06
        assert abs(r["min_llr"] - (min(c for _, c in cs))) < 1e-06
        crossed = [d for d, c in cs if abs(c) > A]
        up = [d for d, c in cs if c > A]
        dn = [d for d, c in cs if c < -A]
        assert r["crossed_day"] == (min(crossed) if crossed else None)
        if up and (not dn or min(up) < min(dn)):
            assert r["decision"] == "accept_h1"
        elif dn:
            assert r["decision"] == "accept_h0"
        else:
            assert r["decision"] == "continue"

"""Wave-70 semantics: cross-source LM transfer, runs test."""

from __future__ import annotations

import math
import re
import statistics
from collections import Counter, defaultdict

import biosets_spark.queries.wave70 as w70  # noqa: F401  (registers the wave)
from biosets_spark.queries import QUERIES
from tests.conftest import SF_SMOKE

_WS = re.compile(r"[ \t\n\x0b\f\r]+")


def test_cross_entropy_sources_matches_bruteforce(spark):
    rows = {r["source"]: r
            for r in QUERIES["q_cross_entropy_sources"].fn(spark, SF_SMOKE).collect()}
    docs = spark.read.parquet(f"{SF_SMOKE}/documents.parquet").collect()
    cnt = defaultdict(Counter)
    for d in docs:
        cnt[d["source"]].update(t for t in _WS.split(d["text"].strip()) if t)
    vocab = len({t for c in cnt.values() for t in c})
    tot = {s: sum(c.values()) for s, c in cnt.items()}
    for ev in cnt:
        best = None
        for md in cnt:
            if md == ev:
                continue
            x = sum(
                round(-(c / tot[ev])
                      * math.log((cnt[md].get(w, 0) + 1) / (tot[md] + vocab)),
                      10)
                for w, c in cnt[ev].items()
            )
            key = (x, md)
            if best is None or key < best:
                best = key
        r = rows[ev]
        assert r["closest_source"] == best[1]
        assert abs(r["cross_entropy"] - round(best[0], 6)) < 1e-5
        # cross-entropy under a smoothed foreign LM is positive
        assert r["cross_entropy"] > 0


def test_runs_test_matches_bruteforce(spark):
    rows = {r["event_type"]: r
            for r in QUERIES["q_runs_test"].fn(spark, SF_SMOKE).collect()}
    events = spark.read.parquet(f"{SF_SMOKE}/events.parquet").collect()
    acc = defaultdict(lambda: [0, 0])
    for e in events:
        k = (e["event_type"], e["ts"].date())
        acc[k][0] += round(round(e["value"], 2) * 100)
        acc[k][1] += 1
    series = defaultdict(list)
    for (et, day), (c, n) in acc.items():
        series[et].append((day, round(c / 100 / n, 6)))
    for et, pts in series.items():
        pts.sort()
        ms = [m for _, m in pts]
        md = statistics.median(ms)
        signs = [1 if m > md else 0 for m in ms if m != md]
        n1 = sum(signs)
        n2 = len(signs) - n1
        runs = 1 + sum(1 for i in range(1, len(signs))
                       if signs[i] != signs[i - 1])
        er = 2 * n1 * n2 / (n1 + n2) + 1
        sigma = math.sqrt(2 * n1 * n2 * (2 * n1 * n2 - n1 - n2)
                          / ((n1 + n2) ** 2 * (n1 + n2 - 1)))
        r = rows[et]
        assert (r["n_above"], r["n_below"], r["n_runs"]) == (n1, n2, runs)
        assert abs(r["expected_runs"] - round(er, 6)) < 1e-6
        assert abs(r["z_runs"] - round((runs - er) / sigma, 6)) < 1e-6
        # runs count is bounded by the sequence structure
        assert 1 <= runs <= len(signs)

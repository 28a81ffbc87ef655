"""Wave-64 semantics: vocabulary overlap, inter-arrival fit."""

from __future__ import annotations

import datetime
import math
import re
from collections import defaultdict

import biosets_spark.queries.wave64 as w64  # noqa: F401  (registers the wave)
from biosets_spark.queries import QUERIES
from tests.conftest import SF_SMOKE

_WS = re.compile(r"[ \t\n\x0b\f\r]+")


def test_vocab_overlap_matches_bruteforce(spark):
    got = QUERIES["q_vocab_overlap"].fn(spark, SF_SMOKE).collect()
    docs = spark.read.parquet(f"{SF_SMOKE}/documents.parquet").collect()
    vocab = defaultdict(set)
    for d in docs:
        vocab[d["source"]].update(
            t for t in _WS.split(d["text"].strip()) if t
        )
    srcs = sorted(vocab)
    pairs = []
    for i, a in enumerate(srcs):
        for b in srcs[i + 1:]:
            common = len(vocab[a] & vocab[b])
            jac = common / len(vocab[a] | vocab[b])
            pairs.append((-jac, a, b, common))
    pairs.sort()
    assert len(got) == 15
    for row, (nj, a, b, common) in zip(got, pairs[:15]):
        assert (row["source_a"], row["source_b"]) == (a, b)
        assert row["n_common"] == common
        assert row["vocab_a"] == len(vocab[a])
        assert row["vocab_b"] == len(vocab[b])
        assert abs(row["jaccard"] - round(-nj, 6)) < 1e-9


def test_interarrival_fit_matches_bruteforce(spark):
    rows = {r["event_type"]: r
            for r in QUERIES["q_interarrival_fit"].fn(spark, SF_SMOKE).collect()}
    events = spark.read.parquet(f"{SF_SMOKE}/events.parquet").collect()
    epoch = datetime.datetime(1970, 1, 1)
    one_us = datetime.timedelta(microseconds=1)
    by_type = defaultdict(list)
    for e in events:
        us = (e["ts"].replace(tzinfo=None) - epoch) // one_us
        by_type[e["event_type"]].append((e["ts"], e["event_id"], us))
    for et, pts in by_type.items():
        pts.sort(key=lambda p: (p[0], p[1]))
        gaps = [pts[i][2] - pts[i - 1][2] for i in range(1, len(pts))]
        n = len(gaps)
        mean = sum(gaps) / n
        var = sum(g * g for g in gaps) / n - mean ** 2
        cov = math.sqrt(var) / mean
        gaps_sorted = sorted(gaps)
        d = 0.0
        seen = 0
        i = 0
        while i < n:
            j = i
            while j < n and gaps_sorted[j] == gaps_sorted[i]:
                j += 1
            fe = 1 - math.exp(-gaps_sorted[i] / mean)
            d = max(d, abs(j / n - fe), abs(seen / n - fe))
            seen = j
            i = j
        r = rows[et]
        assert r["n_gaps"] == n
        assert abs(r["mean_gap_sec"] - round(mean / 1e6, 6)) < 1e-6
        assert abs(r["cov"] - round(cov, 6)) < 1e-5
        assert abs(r["ks_distance"] - round(d, 6)) < 1e-5
        assert r["reject_exponential_5pct"] == (d > 1.358 / math.sqrt(n))
        assert 0 <= r["ks_distance"] <= 1

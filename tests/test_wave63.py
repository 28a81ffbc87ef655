"""Wave-63 semantics: Burrows' delta, Renyi entropy spectrum."""

from __future__ import annotations

import math
import re
from collections import Counter, defaultdict

import biosets_spark.queries.wave63 as w63  # noqa: F401  (registers the wave)
from biosets_spark.queries import QUERIES
from tests.conftest import SF_SMOKE

_WS = re.compile(r"[ \t\n\x0b\f\r]+")


def _source_tokens(spark):
    docs = spark.read.parquet(f"{SF_SMOKE}/documents.parquet").collect()
    by_src = defaultdict(list)
    for d in docs:
        by_src[d["source"]].extend(t for t in _WS.split(d["text"].strip()) if t)
    return by_src


def test_burrows_delta_matches_bruteforce(spark):
    got = QUERIES["q_burrows_delta"].fn(spark, SF_SMOKE).collect()
    by_src = _source_tokens(spark)
    corpus = Counter()
    for toks in by_src.values():
        corpus.update(toks)
    topk = [t for t, _ in sorted(corpus.items(), key=lambda x: (-x[1], x[0]))[:30]]
    srcs = sorted(by_src)
    f = {}
    for s in srcs:
        cnt = Counter(by_src[s])
        ns = len(by_src[s])
        for t in topk:
            f[(s, t)] = round(cnt.get(t, 0) / ns, 10)
    z = {}
    for t in topk:
        vals = [f[(s, t)] for s in srcs]
        k = len(vals)
        mu = sum(vals) / k
        s2 = sum(round(v * v, 14) for v in vals) / k
        sd = math.sqrt(s2 - mu * mu)
        for s in srcs:
            z[(s, t)] = (f[(s, t)] - mu) / sd
    deltas = []
    for i, a in enumerate(srcs):
        for b in srcs[i + 1:]:
            d = sum(round(abs(z[(a, t)] - z[(b, t)]), 8) for t in topk) / 30
            deltas.append((round(d, 6), a, b))
    deltas.sort()
    expect = deltas[:10]
    assert len(got) == 10
    for row, (d, a, b) in zip(got, expect):
        assert (row["source_a"], row["source_b"]) == (a, b)
        assert abs(row["delta"] - d) < 1e-5


def test_renyi_spectrum_matches_bruteforce(spark):
    rows = {r["source"]: r
            for r in QUERIES["q_renyi_spectrum"].fn(spark, SF_SMOKE).collect()}
    for src, toks in _source_tokens(spark).items():
        cnt = Counter(toks)
        ns = len(toks)
        v = len(cnt)
        h1 = sum(round(-(c / ns) * math.log(c / ns), 12) for c in cnt.values())
        p2 = sum(round((c / ns) ** 2, 12) for c in cnt.values())
        h2 = -math.log(p2)
        r = rows[src]
        assert r["richness"] == v
        assert abs(r["h0"] - round(math.log(v), 6)) < 1e-6
        assert abs(r["h1_shannon"] - round(h1, 6)) < 1e-5
        assert abs(r["h2_collision"] - round(h2, 6)) < 1e-5
        assert abs(r["evenness"] - round(h1 / math.log(v), 6)) < 1e-5
        # Renyi entropies are non-increasing in alpha: H0 >= H1 >= H2
        assert r["h0"] >= r["h1_shannon"] - 1e-9
        assert r["h1_shannon"] >= r["h2_collision"] - 1e-9

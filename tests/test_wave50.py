"""Wave-50 semantics: Heaps' law curve, word adaptation."""

from __future__ import annotations

import hashlib
import math
import re
from collections import Counter, defaultdict

import biosets_spark.queries.wave50  # noqa: F401  (registers the wave)
from biosets_spark.queries import QUERIES
from tests.conftest import SF_SMOKE


def _h(s):
    return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)


def _toks(text):
    return [t for t in re.split("[ \t\n\x0b\f\r]+", text.strip()) if t]


def test_heaps_law_curve_matches_bruteforce(spark):
    rows = QUERIES["q_heaps_law"].fn(spark, SF_SMOKE).collect()
    docs = spark.read.parquet(f"{SF_SMOKE}/documents.parquet").collect()
    bucket_docs = Counter()
    first_bucket = {}
    for d in docs:
        b = _h(str(d["doc_id"])) % 10
        bucket_docs[b] += 1
        for t in _toks(d["text"]):
            if t not in first_bucket or b < first_bucket[t]:
                first_bucket[t] = b
    pts = []
    for k in sorted(bucket_docs):
        nd = sum(n for b, n in bucket_docs.items() if b <= k)
        nv = sum(1 for fb in first_bucket.values() if fb <= k)
        pts.append((k, nd, nv))
    assert [(r["checkpoint"], r["cum_docs"], r["cum_vocab"]) for r in rows] == pts
    # OLS slope over quantized log-log points
    lx = [round(math.log(nd), 12) for _, nd, _ in pts]
    ly = [round(math.log(nv), 12) for _, _, nv in pts]
    n = len(pts)
    beta = (n * sum(a * b for a, b in zip(lx, ly)) - sum(lx) * sum(ly)) / (
        n * sum(a * a for a in lx) - sum(lx) ** 2)
    for r in rows:
        assert abs(r["heaps_beta"] - (beta)) < 1e-05
    # curve is monotone: vocabulary never shrinks as docs accumulate
    vocabs = [r["cum_vocab"] for r in rows]
    assert vocabs == sorted(vocabs)


def test_word_adaptation_matches_bruteforce(spark):
    rows = QUERIES["q_word_adaptation"].fn(spark, SF_SMOKE).collect()
    docs = spark.read.parquet(f"{SF_SMOKE}/documents.parquet").collect()
    per_doc = defaultdict(Counter)
    for d in docs:
        per_doc[d["doc_id"]].update(_toks(d["text"]))
    cf = Counter()
    df = Counter()
    df2 = Counter()
    for counts in per_doc.values():
        for t, c in counts.items():
            cf[t] += c
            df[t] += 1
            if c >= 2:
                df2[t] += 1
    n_docs = len(docs)
    expect = sorted(cf.items(), key=lambda kv: (-kv[1], kv[0]))[:20]
    assert [(r["tok"], r["corpus_freq"]) for r in rows] == expect
    for r in rows:
        t = r["tok"]
        assert r["doc_freq"] == df[t]
        adapt = df2[t] / df[t]
        assert abs(r["adaptation"] - (adapt)) < 1e-06
        assert abs(r["adaptation_lift"]
                   - (adapt / (df[t] / n_docs))) < 1e-05
        assert 0 <= r["adaptation"] <= 1

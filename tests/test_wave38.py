"""Wave-38 semantics: Z-order layout audit, readability panel."""

from __future__ import annotations

import re

import biosets_spark.queries.wave38  # noqa: F401  (registers the wave)
from biosets_spark.queries import QUERIES
from tests.conftest import SF_SMOKE


def _morton(u: int, d: int) -> int:
    z = 0
    for i in range(4):
        z |= ((u >> i) & 1) << (2 * i + 1)
        z |= ((d >> i) & 1) << (2 * i)
    return z


def test_zorder_buckets_bound_both_dimensions(spark):
    rows = QUERIES["q_zorder_layout"].fn(spark, SF_SMOKE).collect()
    ev = spark.read.parquet(f"{SF_SMOKE}/events.parquet")
    assert sum(r["n_events"] for r in rows) == ev.count()
    for r in rows:
        # the Z-order guarantee: top-4-bit Morton buckets confine BOTH
        # dims to a 4x4 cell — a single-key sort can't do this
        assert 0 <= r["u_span"] <= 3
        assert 0 <= r["d_span"] <= 3
        assert r["u_min"] // 4 == r["u_max"] // 4
        assert r["d_min"] // 4 == r["d_max"] // 4
        # bucket id really is the Morton prefix of its cell
        assert _morton(r["u_min"], r["d_min"]) >> 4 == r["bucket"]


def test_readability_matches_bruteforce(spark):
    rows = {r["lang"]: r
            for r in QUERIES["q_readability"].fn(spark, SF_SMOKE).collect()}
    docs = spark.read.parquet(f"{SF_SMOKE}/documents.parquet").collect()
    agg = {}
    for doc in docs:
        text = doc["text"]
        words = max(len([t for t in re.split("[ \t\n\x0b\f\r]+", text.strip())
                         if t]), 1)
        sents = max(len(re.findall("[.!?]+", text)), 1)
        sylls = max(len(re.findall("[aeiouyAEIOUY]+", text)), 1)
        flesch = round(206.835 - 1.015 * words / sents - 84.6 * sylls / words, 6)
        a = agg.setdefault(doc["lang"], [0, 0, 0, 0, 0.0])
        a[0] += 1
        a[1] += words
        a[2] += sents
        a[3] += sylls
        a[4] += flesch
    assert set(rows) == set(agg)
    for lang, (n, w, s, y, f) in agg.items():
        r = rows[lang]
        assert r["n_docs"] == n
        assert abs(r["words_per_sentence"] - round(w / s, 6)) < 1e-5
        assert abs(r["syllables_per_word"] - round(y / w, 6)) < 1e-5
        assert abs(float(r["mean_flesch"]) - round(f / n, 6)) < 1e-4

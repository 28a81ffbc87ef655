"""Wave-69 semantics: skip-gram PMI, char-trigram profile."""

from __future__ import annotations

import math
import re
from collections import Counter, defaultdict

import biosets_spark.queries.wave69 as w69  # noqa: F401  (registers the wave)
from biosets_spark.queries import QUERIES
from tests.conftest import SF_SMOKE

_WS = re.compile(r"[ \t\n\x0b\f\r]+")


def test_skipgram_pmi_matches_bruteforce(spark):
    got = QUERIES["q_skipgram_pmi"].fn(spark, SF_SMOKE).collect()
    docs = spark.read.parquet(f"{SF_SMOKE}/documents.parquet").collect()
    pair_c = Counter()
    uni = Counter()
    total = 0
    for d in docs:
        toks = [t for t in _WS.split(d["text"].strip()) if t]
        uni.update(toks)
        for i, w1 in enumerate(toks):
            for j in (i + 1, i + 2):
                if j < len(toks):
                    pair_c[(w1, toks[j])] += 1
                    total += 1
    scored = []
    for (w1, w2), cp in pair_c.items():
        if cp >= 50:
            pmi = math.log(cp * total / (uni[w1] * 2 * uni[w2]))
            scored.append((-pmi, w1, w2, cp))
    scored.sort()
    assert len(got) == 20
    for row, (np_, w1, w2, cp) in zip(got, scored[:20]):
        assert (row["w1"], row["w2"]) == (w1, w2)
        assert row["pair_count"] == cp
        assert abs(row["pmi"] - (-np_)) < 1e-06


def test_char_trigram_profile_matches_bruteforce(spark):
    got = QUERIES["q_char_trigram_profile"].fn(spark, SF_SMOKE).collect()
    docs = spark.read.parquet(f"{SF_SMOKE}/documents.parquet").collect()
    by_lang = defaultdict(Counter)
    for d in docs:
        t = d["text"].lower()
        for i in range(len(t) - 2):
            by_lang[d["lang"]][t[i:i + 3]] += 1
    by_key = {(r["lang"], r["rnk"]): r for r in got}
    for lang, cnt in by_lang.items():
        nt = sum(cnt.values())
        top = sorted(cnt.items(), key=lambda x: (-x[1], x[0]))[:5]
        for rnk, (tri, c) in enumerate(top, 1):
            r = by_key[(lang, rnk)]
            assert r["tri"] == tri
            assert r["n_occurrences"] == c
            assert abs(r["share"] - (c / nt)) < 1e-06
    # 5 langs x 5 rows
    assert len(got) == 5 * len(by_lang)

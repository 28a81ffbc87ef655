"""Wave-45 semantics: held-out perplexity, feature-hash collisions."""

from __future__ import annotations

import math
import re
from collections import Counter

import hashlib

import biosets_spark.queries.wave45  # noqa: F401  (registers the wave)
from biosets_spark.queries import QUERIES
from tests.conftest import SF_SMOKE


def PORTABLE_HASH_PY(s: str) -> int:
    """Python twin of operators.dedup.portable_hash60."""
    return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)


def _toks(text):
    return [t for t in re.split("[ \t\n\x0b\f\r]+", text.strip()) if t]


def test_heldout_perplexity_matches_bruteforce(spark):
    (row,) = QUERIES["q_heldout_perplexity"].fn(spark, SF_SMOKE).collect()
    docs = spark.read.parquet(f"{SF_SMOKE}/documents.parquet").collect()
    train_bg = Counter()
    train_w1 = Counter()
    train_vocab = set()
    test_bgs = []
    n_train = n_test = 0
    for d in docs:
        toks = _toks(d["text"])
        bgs = [f"{a} {b}" for a, b in zip(toks, toks[1:])]
        if PORTABLE_HASH_PY(str(d["doc_id"])) % 5 == 0:
            n_test += 1
            test_bgs.extend(bgs)
        else:
            n_train += 1
            train_bg.update(bgs)
            train_w1.update(b.split(" ")[0] for b in bgs)
            train_vocab.update(toks)
    v = len(train_vocab)
    s = oov = 0
    for b in test_bgs:
        w1 = b.split(" ")[0]
        cbg = train_bg.get(b, 0)
        if cbg == 0:
            oov += 1
        s += round(-math.log((cbg + 1) / (train_w1.get(w1, 0) + v)), 8)
    assert (row["n_train_docs"], row["n_test_docs"]) == (n_train, n_test)
    assert row["n_test_bigrams"] == len(test_bgs)
    assert abs(row["oov_rate"] - (oov / len(test_bgs))) < 1e-06
    assert abs(row["perplexity"] - (math.exp(s / len(test_bgs)))) < 0.001
    # perplexity of a bigram LM is bounded by the smoothed support size
    assert 1 <= row["perplexity"] <= v + 1


def test_feature_hash_collisions_match_bruteforce(spark):
    rows = QUERIES["q_feature_hash_collisions"].fn(spark, SF_SMOKE).collect()
    docs = spark.read.parquet(f"{SF_SMOKE}/documents.parquet").collect()
    occ = Counter()
    for d in docs:
        occ.update(_toks(d["text"]))
    buckets = Counter()
    mass = Counter()
    for tok, n in occ.items():
        b = PORTABLE_HASH_PY(tok) % 16
        buckets[b] += 1
        mass[b] += n
    hist = Counter(buckets.values())
    coll_mass = sum(mass[b] for b, k in buckets.items() if k > 1)
    total_mass = sum(mass.values())
    assert {r["types_in_bucket"]: r["n_buckets"] for r in rows} == dict(hist)
    for r in rows:
        assert r["vocab_size"] == len(occ)
        assert abs(r["collided_mass_share"]
                   - (coll_mass / total_mass)) < 1e-06
    # 31 types into 16 buckets MUST collide (pigeonhole)
    assert any(r["types_in_bucket"] > 1 for r in rows)

"""Wave-65 semantics: truncation duplicates, embedding norm audit."""

from __future__ import annotations

import math
from collections import defaultdict

import biosets_spark.queries.wave65 as w65  # noqa: F401  (registers the wave)
from biosets_spark.queries import QUERIES
from tests.conftest import SF_SMOKE


def test_dedup_truncation_matches_bruteforce(spark):
    got = QUERIES["q_dedup_truncation"].fn(spark, SF_SMOKE).collect()
    docs = spark.read.parquet(f"{SF_SMOKE}/documents.parquet").collect()
    texts = {d["doc_id"]: d["text"] for d in docs}
    expect = []
    ids = sorted(texts)
    for a in ids:
        for b in ids:
            ta, tb = texts[a], texts[b]
            if len(ta) < len(tb) and tb.startswith(ta):
                expect.append((a, b, len(ta), len(tb)))
    expect.sort()
    assert [(r["id_short"], r["id_long"], r["len_short"], r["len_long"])
            for r in got] == expect
    for r in got:
        assert abs(r["kept_fraction"]
                   - (r["len_short"] / r["len_long"])) < 1e-06
        assert 0 < r["kept_fraction"] < 1
    # the synthetic corpus plants truncation dups — the query must find some
    assert len(got) > 0


def test_embedding_norms_matches_bruteforce(spark):
    rows = {r["label"]: r
            for r in QUERIES["q_embedding_norms"].fn(spark, SF_SMOKE).collect()}
    embs = spark.read.parquet(f"{SF_SMOKE}/embeddings.parquet").collect()
    by_label = defaultdict(list)
    for e in embs:
        sq = sum(round(round(float(x), 6) * round(float(x), 6), 12)
                 for x in e["embedding"])
        by_label[e["label"]].append(math.sqrt(sq))
    for lbl, norms in by_label.items():
        r = rows[lbl]
        assert r["n_vectors"] == len(norms)
        mean = sum(round(n, 8) for n in norms) / len(norms)
        assert abs(r["mean_norm"] - (mean)) < 1e-06
        assert abs(r["min_norm"] - (min(norms))) < 1e-06
        assert abs(r["max_norm"] - (max(norms))) < 1e-06
        assert r["n_degenerate"] == sum(1 for n in norms if n < 1e-6)
        assert abs(r["norm_spread"]
                   - (max(norms) / min(norms))) < 1e-05
        assert r["min_norm"] <= r["mean_norm"] <= r["max_norm"]

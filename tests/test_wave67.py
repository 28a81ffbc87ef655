"""Wave-67 semantics: label separation, leave-one-out 1-NN eval."""

from __future__ import annotations

import math
from collections import defaultdict

import biosets_spark.queries.wave67 as w67  # noqa: F401  (registers the wave)
from biosets_spark.queries import QUERIES
from tests.conftest import SF_SMOKE


def _unit_vectors(spark):
    embs = spark.read.parquet(f"{SF_SMOKE}/embeddings.parquet").collect()
    out = []
    for e in embs:
        v = [round(float(x), 6) for x in e["embedding"]]
        l2 = math.sqrt(sum(round(x * x, 12) for x in v))
        out.append((e["vec_id"], e["label"], [round(x / l2, 8) for x in v]))
    return out


def test_label_separation_matches_pairwise_bruteforce(spark):
    (row,) = QUERIES["q_label_separation"].fn(spark, SF_SMOKE).collect()
    vecs = _unit_vectors(spark)
    n = len(vecs)
    intra = inter = 0.0
    n_intra = n_inter = 0
    for i in range(n):
        for j in range(n):
            if i == j:
                continue
            c = sum(a * b for a, b in zip(vecs[i][2], vecs[j][2]))
            if vecs[i][1] == vecs[j][1]:
                intra += c
                n_intra += 1
            else:
                inter += c
                n_inter += 1
    assert row["n_vectors"] == n
    assert row["n_labels"] == len({l for _, l, _ in vecs})
    assert abs(row["mean_intra_cosine"] - intra / n_intra) < 1e-4
    assert abs(row["mean_inter_cosine"] - inter / n_inter) < 1e-4
    assert abs(row["separation"]
               - (intra / n_intra - inter / n_inter)) < 1e-4
    # the synthetic labels are geometrically arbitrary, so the audit's
    # verdict is "no separation" — the value must be tiny, and the
    # invariant |mean cosine| <= 1 must hold on both sides
    assert abs(row["separation"]) < 0.05
    assert -1 <= row["mean_intra_cosine"] <= 1
    assert -1 <= row["mean_inter_cosine"] <= 1


def test_knn_loo_eval_matches_bruteforce(spark):
    rows = {r["label"]: r
            for r in QUERIES["q_knn_loo_eval"].fn(spark, SF_SMOKE).collect()}
    vecs = _unit_vectors(spark)
    per_label = defaultdict(lambda: [0, 0])
    for i, (vid, lbl, u) in enumerate(vecs):
        best = None
        for j, (nid, nlbl, w) in enumerate(vecs):
            if i == j:
                continue
            c = sum(a * b for a, b in zip(u, w))
            key = (-c, nid)
            if best is None or key < best[0]:
                best = (key, nlbl)
        per_label[lbl][0] += 1
        per_label[lbl][1] += best[1] == lbl
    for lbl, (n, k) in per_label.items():
        r = rows[lbl]
        assert r["n_vectors"] == n
        assert r["n_correct"] == k
        assert abs(r["loo_accuracy"] - (k / n)) < 1e-06
    # the synthetic labels are geometrically arbitrary: LOO accuracy
    # lands near the 1/n_labels chance rate — the audit's verdict —
    # and must stay a valid rate
    total_n = sum(v[0] for v in per_label.values())
    total_k = sum(v[1] for v in per_label.values())
    assert 0 <= total_k / total_n <= 1
    assert total_n == len(vecs)

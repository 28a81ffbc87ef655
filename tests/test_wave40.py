"""Wave-40 semantics: exact ROC AUC, Good-Turing FoF."""

from __future__ import annotations

from collections import Counter

import biosets_spark.queries.wave40  # noqa: F401  (registers the wave)
from biosets_spark.queries import QUERIES
from tests.conftest import SF_SMOKE


def _auc_bruteforce(scores_pos, scores_neg):
    wins = ties = 0
    neg_counter = Counter(scores_neg)
    neg_sorted = sorted(neg_counter)
    import bisect

    prefix = [0]
    for v in neg_sorted:
        prefix.append(prefix[-1] + neg_counter[v])
    for p in scores_pos:
        i = bisect.bisect_left(neg_sorted, p)
        wins += prefix[i]
        if i < len(neg_sorted) and neg_sorted[i] == p:
            ties += neg_counter[p]
    return (wins + ties / 2) / (len(scores_pos) * len(scores_neg))


def test_auc_matches_pairwise_definition(spark):
    rows = {r["o_orderstatus"]: r
            for r in QUERIES["q_auc_roc"].fn(spark, SF_SMOKE).collect()}
    orders = spark.read.parquet(f"{SF_SMOKE}/orders.parquet").collect()
    by_st = {}
    for o in orders:
        by_st.setdefault(o["o_orderstatus"], ([], []))[
            0 if o["o_orderpriority"] == "1-URGENT" else 1
        ].append(round(o["o_totalprice"] * 100))
    for st, (pos, neg) in by_st.items():
        if not pos or not neg:
            assert st not in rows or rows[st]["n_pos"] == 0 or rows[st]["n_neg"] == 0
            continue
        r = rows[st]
        assert (r["n_pos"], r["n_neg"]) == (len(pos), len(neg))
        expect = _auc_bruteforce(pos, neg)
        assert abs(r["auc"] - round(expect, 6)) < 1e-6
        assert 0 <= r["auc"] <= 1


def test_good_turing_matches_bruteforce(spark):
    import re

    rows = QUERIES["q_good_turing"].fn(spark, SF_SMOKE).collect()
    docs = spark.read.parquet(f"{SF_SMOKE}/documents.parquet").collect()
    tok = Counter()
    for d in docs:
        tok.update(t for t in re.split("[ \t\n\x0b\f\r]+", d["text"].strip()) if t)
    fof = Counter(tok.values())
    n_tokens = sum(tok.values())
    n1, n2 = fof.get(1, 0), fof.get(2, 0)
    expect_cs = sorted(fof)[:20]
    assert [r["freq"] for r in rows] == expect_cs
    for r in rows:
        assert r["n_types"] == fof[r["freq"]]
        assert abs(r["mass_share"]
                   - round(fof[r["freq"]] * r["freq"] / n_tokens, 6)) < 1e-6
        assert abs(r["p_unseen_gt"] - round(n1 / n_tokens, 6)) < 1e-6
        assert abs(r["r1_star"] - round(2 * n2 / n1 if n1 else 0, 6)) < 1e-6
    # FoF masses over ALL frequencies sum to 1
    assert abs(sum(c * fof[c] for c in fof) / n_tokens - 1) < 1e-9

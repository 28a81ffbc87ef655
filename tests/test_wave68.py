"""Wave-68 semantics: decision-stump splits, eta-squared scan."""

from __future__ import annotations

from collections import defaultdict

import biosets_spark.queries.wave68 as w68  # noqa: F401  (registers the wave)
from biosets_spark.queries import QUERIES
from tests.conftest import SF_SMOKE


def test_stump_split_matches_bruteforce(spark):
    rows = {r["feature"]: r
            for r in QUERIES["q_stump_split"].fn(spark, SF_SMOKE).collect()}
    li = spark.read.parquet(f"{SF_SMOKE}/lineitem.parquet").collect()
    feats = {
        "discount": lambda x: round(x["l_discount"] * 100),
        "quantity": lambda x: int(x["l_quantity"]),
        "tax": lambda x: round(x["l_tax"] * 100),
    }
    for name, fv in feats.items():
        hist = defaultdict(lambda: [0, 0])
        for x in li:
            h = hist[fv(x)]
            h[0] += 1
            h[1] += x["l_returnflag"] == "R"
        nt = sum(v[0] for v in hist.values())
        kt = sum(v[1] for v in hist.values())

        def gini(k, n):
            p = k / n
            return 1 - p * p - (1 - p) * (1 - p)

        best = None
        nl = kl = 0
        for v in sorted(hist):
            nl += hist[v][0]
            kl += hist[v][1]
            if nl >= nt:
                continue
            g = nl / nt * gini(kl, nl) + (nt - nl) / nt * gini(kt - kl, nt - nl)
            if best is None or (g, v) < best:
                best = (g, v)
        r = rows[name]
        assert r["best_cut"] == best[1]
        assert abs(r["gini_before"] - round(gini(kt, nt), 6)) < 1e-6
        assert abs(r["gini_after"] - round(best[0], 6)) < 1e-6
        assert abs(r["gini_gain"]
                   - round(gini(kt, nt) - best[0], 6)) < 1e-6
        # a split can only reduce (or keep) impurity
        assert r["gini_gain"] >= -1e-9


def test_eta2_scan_matches_bruteforce(spark):
    rows = {r["dim"]: r
            for r in QUERIES["q_eta2_scan"].fn(spark, SF_SMOKE).collect()}
    embs = spark.read.parquet(f"{SF_SMOKE}/embeddings.parquet").collect()
    assert set(rows) == set(range(1, 9))
    for dim in range(1, 9):
        by_label = defaultdict(list)
        for e in embs:
            by_label[e["label"]].append(
                round(round(float(e["embedding"][dim - 1]), 6), 8)
            )
        n = sum(len(v) for v in by_label.values())
        s = sum(sum(v) for v in by_label.values())
        ss = sum(round(x * x, 12) for v in by_label.values() for x in v)
        sb_raw = sum(round(sum(v) ** 2 / len(v), 10) for v in by_label.values())
        grand = s * s / n
        eta2 = (sb_raw - grand) / (ss - grand)
        assert abs(rows[dim]["eta2"] - round(eta2, 6)) < 1e-5
        # eta^2 is a variance fraction
        assert -1e-9 <= rows[dim]["eta2"] <= 1

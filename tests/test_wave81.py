"""Wave-81 semantics: Matthews MCC, Brier decomposition."""

from __future__ import annotations

import math
import re
from collections import defaultdict

import biosets_spark.queries.wave81 as w81  # noqa: F401  (registers the wave)
from biosets_spark.queries import QUERIES
from tests.conftest import SF_SMOKE


def test_mcc_matches_bruteforce(spark):
    (row,) = QUERIES["q_matthews_mcc"].fn(spark, SF_SMOKE).collect()
    docs = spark.read.parquet(f"{SF_SMOKE}/documents.parquet").collect()
    stop = re.compile(r"\b(the|a|of|and|to|in|is|it|that|for)\b")
    tp = fp = fn = tn = 0
    for d in docs:
        p = bool(stop.search(d["text"]))
        y = d["lang"] == "en"
        tp += p and y
        fp += p and not y
        fn += (not p) and y
        tn += (not p) and not y
    mcc = (tp * tn - fp * fn) / math.sqrt(
        (tp + fp) * (tp + fn) * (tn + fp) * (tn + fn)
    )
    assert (row["tp"], row["fp"], row["fn"], row["tn"]) == (tp, fp, fn, tn)
    assert abs(row["mcc"] - round(mcc, 6)) < 1e-6
    assert abs(row["accuracy"]
               - round((tp + tn) / (tp + fp + fn + tn), 6)) < 1e-9
    assert -1 <= row["mcc"] <= 1


def test_brier_decomposition_identity(spark):
    (row,) = QUERIES["q_brier_decomposition"].fn(spark, SF_SMOKE).collect()
    orders = spark.read.parquet(f"{SF_SMOKE}/orders.parquet").collect()
    cents = [(round(o["o_totalprice"] * 100),
              int(o["o_orderpriority"] == "1-URGENT")) for o in orders]
    mc = max(c for c, _ in cents)
    probs = [(c / mc, y) for c, y in cents]
    n = len(probs)
    bs = sum(round((p - y) ** 2, 10) for p, y in probs) / n
    bins = defaultdict(lambda: [0, 0, 0.0])
    for p, y in probs:
        b = min(int(p * 10), 9)
        bins[b][0] += 1
        bins[b][1] += y
        bins[b][2] += round(p, 10)
    ybar_all = sum(v[1] for v in bins.values()) / n
    rel = sum(round(nb * (sp / nb - yb / nb) ** 2, 8)
              for nb, yb, sp in bins.values()) / n
    res = sum(round(nb * (yb / nb - ybar_all) ** 2, 8)
              for nb, yb, sp in bins.values()) / n
    unc = ybar_all * (1 - ybar_all)
    assert abs(row["brier_score"] - round(bs, 6)) < 1e-6
    assert abs(row["reliability"] - round(rel, 6)) < 1e-5
    assert abs(row["resolution"] - round(res, 6)) < 1e-5
    assert abs(row["uncertainty"] - round(unc, 6)) < 1e-6
    # Murphy identity holds exactly only when p is constant within a
    # bin; with a continuous score the residual is the within-bin
    # p-variance minus twice the within-bin p-y covariance (either
    # sign), bounded by the decile bin width
    assert abs(row["decomposed_sum"] - row["brier_score"]) < 0.02
    assert row["reliability"] >= 0 and row["resolution"] >= 0

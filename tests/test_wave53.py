"""Wave-53 semantics: odds ratio CI, McNemar paired test."""

from __future__ import annotations

import math
import re
from collections import defaultdict

import biosets_spark.queries.wave53  # noqa: F401  (registers the wave)
from biosets_spark.queries import QUERIES
from tests.conftest import SF_SMOKE

_EN_STOP = {"the", "a", "of", "and", "to", "in", "is", "it", "that", "for"}


def test_odds_ratio_matches_bruteforce(spark):
    rows = {r["o_orderstatus"]: r
            for r in QUERIES["q_odds_ratio"].fn(spark, SF_SMOKE).collect()}
    orders = spark.read.parquet(f"{SF_SMOKE}/orders.parquet").collect()
    cells = defaultdict(lambda: [0, 0, 0, 0])
    for o in orders:
        u = o["o_orderpriority"] == "1-URGENT"
        h = o["o_totalprice"] > 200000
        idx = (0 if h else 1) if u else (2 if h else 3)
        cells[o["o_orderstatus"]][idx] += 1
    for st, (a, b, c, d) in cells.items():
        if min(a, b, c, d) == 0:
            assert st not in rows
            continue
        r = rows[st]
        orr = a * d / (b * c)
        se = math.sqrt(1 / a + 1 / b + 1 / c + 1 / d)
        assert (r["n_urgent_high"], r["n_urgent_low"],
                r["n_other_high"], r["n_other_low"]) == (a, b, c, d)
        assert abs(r["odds_ratio"] - round(orr, 6)) < 1e-6
        assert abs(r["ci_low"] - round(math.exp(math.log(orr) - 1.959964 * se), 6)) < 1e-5
        assert abs(r["ci_high"] - round(math.exp(math.log(orr) + 1.959964 * se), 6)) < 1e-5
        assert r["ci_low"] <= r["odds_ratio"] <= r["ci_high"]


def test_mcnemar_matches_bruteforce(spark):
    (row,) = QUERIES["q_mcnemar_paired"].fn(spark, SF_SMOKE).collect()
    docs = spark.read.parquet(f"{SF_SMOKE}/documents.parquet").collect()
    n = b = c = acc_a = acc_b = 0
    for d in docs:
        truth = d["lang"] == "en"
        toks = [t.lower() for t in re.split("[ \t\n\x0b\f\r]+", d["text"].strip()) if t]
        pa = any(t in _EN_STOP for t in toks)
        ascii_ratio = len(re.sub("[^ -~]", "", d["text"])) / max(len(d["text"]), 1)
        pb = ascii_ratio > 0.95
        n += 1
        if pa == truth:
            acc_a += 1
        if pb == truth:
            acc_b += 1
        if pa == truth and pb != truth:
            b += 1
        if pa != truth and pb == truth:
            c += 1
    assert row["n_docs"] == n
    assert (row["a_only_correct"], row["b_only_correct"]) == (b, c)
    assert abs(row["accuracy_a"] - round(acc_a / n, 6)) < 1e-9
    assert abs(row["accuracy_b"] - round(acc_b / n, 6)) < 1e-9
    if b + c:
        # continuity correction clamps at 0 so b == c gives chi2 = 0,
        # not 1/(b+c) — the most-null case must carry no evidence
        expect = max(abs(b - c) - 1, 0) ** 2 / (b + c)
        assert abs(row["mcnemar_chi2"] - round(expect, 6)) < 1e-6
    else:
        assert row["mcnemar_chi2"] is None

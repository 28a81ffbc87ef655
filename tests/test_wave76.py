"""Wave-76 semantics: MDE planner, vocabulary turnover."""

from __future__ import annotations

import math
import re
from collections import defaultdict

import biosets_spark.queries.wave76 as w76  # noqa: F401  (registers the wave)
from biosets_spark.queries import QUERIES
from tests.conftest import SF_SMOKE

_WS = re.compile(r"[ \t\n\x0b\f\r]+")


def test_mde_planner_matches_closed_form(spark):
    rows = {r["o_orderstatus"]: r
            for r in QUERIES["q_mde_planner"].fn(spark, SF_SMOKE).collect()}
    orders = spark.read.parquet(f"{SF_SMOKE}/orders.parquet").collect()
    base = defaultdict(lambda: [0, 0])
    for o in orders:
        base[o["o_orderstatus"]][0] += 1
        base[o["o_orderstatus"]][1] += o["o_orderpriority"] == "1-URGENT"
    za, zb = 1.959964, 0.841621
    for st, (n, k) in base.items():
        p = k / n
        n_arm = n // 2
        mde = (za + zb) * math.sqrt(2 * p * (1 - p) / n_arm)
        r = rows[st]
        assert r["n_current"] == n and r["n_per_arm"] == n_arm
        assert abs(r["base_rate"] - (p)) < 1e-06
        assert abs(r["mde_absolute"] - (mde)) < 1e-06
        assert abs(r["mde_relative"] - (mde / p)) < 1e-05
        # sanity: the MDE planner and a power calc agree in direction —
        # detecting the MDE lift needs about the available n per arm
        assert 0 < r["mde_absolute"] < 1


def test_vocab_turnover_matches_bruteforce(spark):
    rows = {r["lang"]: r
            for r in QUERIES["q_vocab_turnover"].fn(spark, SF_SMOKE).collect()}
    docs = spark.read.parquet(f"{SF_SMOKE}/documents.parquet").collect()
    mid = max(d["doc_id"] for d in docs) // 2
    early = defaultdict(set)
    late = defaultdict(set)
    for d in docs:
        toks = {t for t in _WS.split(d["text"].strip()) if t}
        (early if d["doc_id"] <= mid else late)[d["lang"]].update(toks)
    for lang in set(early) | set(late):
        e, l = early[lang], late[lang]
        r = rows[lang]
        assert r["vocab_early"] == len(e)
        assert r["vocab_late"] == len(l)
        assert r["retained"] == len(e & l)
        assert r["new_types"] == len(l - e)
        assert r["retired_types"] == len(e - l)
        assert abs(r["turnover_rate"] - (len(l - e) / len(l))) < 1e-06
        # identity: early + new = late + retired
        assert (r["vocab_early"] + r["new_types"]
                == r["vocab_late"] + r["retired_types"])

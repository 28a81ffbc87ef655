"""Wave-92 semantics: Mantel-Haenszel OR, meta heterogeneity."""

from __future__ import annotations

import math
from collections import defaultdict

import biosets_spark.queries.wave92 as w92  # noqa: F401  (registers the wave)
from biosets_spark.queries import QUERIES
from tests.conftest import SF_SMOKE


def _cells(spark):
    li = spark.read.parquet(f"{SF_SMOKE}/lineitem.parquet").collect()
    prio = {o["o_orderkey"]: o["o_orderpriority"]
            for o in spark.read.parquet(f"{SF_SMOKE}/orders.parquet").collect()}
    cells = defaultdict(lambda: [0, 0, 0, 0])
    for x in li:
        s = prio[x["l_orderkey"]]
        e = x["l_discount"] >= 0.05
        r = x["l_returnflag"] == "R"
        idx = 0 if (e and r) else 1 if (e and not r) else 2 if r else 3
        cells[s][idx] += 1
    return cells


def test_mantel_haenszel_matches_bruteforce(spark):
    (row,) = QUERIES["q_mantel_haenszel"].fn(spark, SF_SMOKE).collect()
    cells = _cells(spark)
    num = sum(round(a * d / (a + b + c + d), 8)
              for a, b, c, d in cells.values())
    den = sum(round(b * c / (a + b + c + d), 8)
              for a, b, c, d in cells.values())
    at = sum(v[0] for v in cells.values())
    bt = sum(v[1] for v in cells.values())
    ct = sum(v[2] for v in cells.values())
    dt = sum(v[3] for v in cells.values())
    assert row["n_strata"] == len(cells)
    assert abs(row["or_mh"] - round(num / den, 6)) < 1e-6
    assert abs(row["or_pooled_naive"] - round(at * dt / (bt * ct), 6)) < 1e-6
    assert row["or_mh"] > 0


def test_meta_heterogeneity_matches_bruteforce(spark):
    (row,) = QUERIES["q_meta_heterogeneity"].fn(spark, SF_SMOKE).collect()
    cells = _cells(spark)
    studies = []
    for a, b, c, d in cells.values():
        a5, b5, c5, d5 = a + 0.5, b + 0.5, c + 0.5, d + 0.5
        lor = math.log(a5 * d5 / (b5 * c5))
        w = 1 / (1 / a5 + 1 / b5 + 1 / c5 + 1 / d5)
        studies.append((lor, w))
    k = len(studies)
    mu = (sum(round(w * lor, 10) for lor, w in studies)
          / sum(round(w, 10) for _, w in studies))
    q = sum(round(w * (lor - mu) ** 2, 10) for lor, w in studies)
    i2 = max((q - (k - 1)) / q, 0)
    assert row["n_strata"] == k
    assert abs(row["pooled_or_fixed"] - round(math.exp(mu), 6)) < 1e-5
    assert abs(row["cochran_q"] - round(q, 6)) < 1e-6
    assert abs(row["i_squared"] - round(i2, 6)) < 1e-6
    assert row["heterogeneous_5pct"] == (q > 9.487729)
    assert 0 <= row["i_squared"] < 1

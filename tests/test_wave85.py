"""Wave-85 semantics: average precision, NDCG@100."""

from __future__ import annotations

import math

import biosets_spark.queries.wave85 as w85  # noqa: F401  (registers the wave)
from biosets_spark.queries import QUERIES
from tests.conftest import SF_SMOKE


def _ranked(spark):
    orders = spark.read.parquet(f"{SF_SMOKE}/orders.parquet").collect()
    rows = [(round(o["o_totalprice"] * 100), o["o_orderkey"],
             o["o_orderpriority"]) for o in orders]
    rows.sort(key=lambda r: (-r[0], r[1]))
    return rows


def test_average_precision_matches_bruteforce(spark):
    (row,) = QUERIES["q_average_precision"].fn(spark, SF_SMOKE).collect()
    rows = _ranked(spark)
    cum_y = 0
    terms = []
    for rnk, (_, _, prio) in enumerate(rows, 1):
        if prio == "1-URGENT":
            cum_y += 1
            terms.append(round(cum_y / rnk, 10))
    ap = sum(terms) / len(terms)
    assert row["n_orders"] == len(rows)
    assert row["n_relevant"] == len(terms)
    assert abs(row["average_precision"] - round(ap, 6)) < 1e-6
    assert abs(row["base_rate"] - round(len(terms) / len(rows), 6)) < 1e-9
    # a random-ish score stays near the base rate; bounds always hold
    assert 0 <= row["average_precision"] <= 1
    assert row["average_precision"] >= row["base_rate"] * 0.5


def test_ndcg_matches_bruteforce(spark):
    (row,) = QUERIES["q_ndcg_at_100"].fn(spark, SF_SMOKE).collect()
    rows = _ranked(spark)
    grade = {"1-URGENT": 2, "2-HIGH": 1}
    dcg = sum(
        round((2 ** grade.get(p, 0) - 1) / math.log2(rnk + 1), 10)
        for rnk, (_, _, p) in enumerate(rows[:100], 1)
    )
    n2 = sum(1 for _, _, p in rows if p == "1-URGENT")
    n1 = sum(1 for _, _, p in rows if p == "2-HIGH")
    idcg = 0.0
    for pos in range(1, 101):
        g = 2 if pos <= n2 else (1 if pos <= n2 + n1 else 0)
        idcg += round((2 ** g - 1) / math.log2(pos + 1), 10)
    assert abs(row["dcg_100"] - round(dcg, 6)) < 1e-6
    assert abs(row["idcg_100"] - round(idcg, 6)) < 1e-6
    assert abs(row["ndcg_100"] - round(dcg / idcg, 6)) < 1e-6
    assert 0 <= row["ndcg_100"] <= 1

"""Wave-42 semantics: k-anonymity and l-diversity audits."""

from __future__ import annotations

import math
from collections import Counter, defaultdict

import biosets_spark.queries.wave42  # noqa: F401  (registers the wave)
from biosets_spark.queries import QUERIES
from tests.conftest import SF_SMOKE


def _qid(c):
    return (c["c_nationkey"], c["c_mktsegment"], math.floor(c["c_acctbal"] / 1000))


def test_k_anonymity_matches_bruteforce(spark):
    rows = QUERIES["q_k_anonymity"].fn(spark, SF_SMOKE).collect()
    cust = spark.read.parquet(f"{SF_SMOKE}/customer.parquet").collect()
    classes = Counter(_qid(c) for c in cust)
    sizes = Counter(classes.values())
    k = min(classes.values())
    expect = sorted(sizes)[:20]
    assert [r["class_size"] for r in rows] == expect
    n = len(cust)
    for r in rows:
        assert r["n_classes"] == sizes[r["class_size"]]
        assert r["n_rows_in_size"] == r["class_size"] * sizes[r["class_size"]]
        assert abs(r["row_share"] - round(r["n_rows_in_size"] / n, 6)) < 1e-9
        assert r["k_anonymity"] == k
    # shares over ALL sizes sum to 1
    assert sum(s * c for s, c in sizes.items()) == n


def test_l_diversity_matches_bruteforce(spark):
    rows = QUERIES["q_l_diversity"].fn(spark, SF_SMOKE).collect()
    cust = {c["c_custkey"]: c
            for c in spark.read.parquet(f"{SF_SMOKE}/customer.parquet").collect()}
    orders = spark.read.parquet(f"{SF_SMOKE}/orders.parquet").collect()
    sens = defaultdict(set)
    nrows = Counter()
    for o in orders:
        c = cust[o["o_custkey"]]
        sens[_qid(c)].add(o["o_orderpriority"])
        nrows[_qid(c)] += 1
    by_l = defaultdict(list)
    for q, vals in sens.items():
        by_l[len(vals)].append(nrows[q])
    l_div = min(len(v) for v in sens.values())
    assert [r["l_distinct"] for r in rows] == sorted(by_l)
    for r in rows:
        assert r["n_classes"] == len(by_l[r["l_distinct"]])
        assert r["min_class_rows"] == min(by_l[r["l_distinct"]])
        assert r["l_diversity"] == l_div
    # invariant: a class can't have more distinct sensitive values
    # than rows
    for q, vals in sens.items():
        assert len(vals) <= nrows[q]

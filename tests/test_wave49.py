"""Wave-49 semantics: assortativity, power-law alpha."""

from __future__ import annotations

import math
from collections import Counter, defaultdict

import biosets_spark.queries.wave49  # noqa: F401  (registers the wave)
from biosets_spark.queries import QUERIES
from tests.conftest import SF_SMOKE


def _edges_bruteforce(spark):
    li = spark.read.parquet(f"{SF_SMOKE}/lineitem.parquet").collect()
    by_order = defaultdict(set)
    for x in li:
        by_order[x["l_orderkey"]].add(x["l_partkey"])
    pair_count = Counter()
    for parts in by_order.values():
        ps = sorted(parts)
        for i in range(len(ps)):
            for j in range(i + 1, len(ps)):
                pair_count[(ps[i], ps[j])] += 1
    return [p for p, c in pair_count.items() if c >= 2]


def test_assortativity_matches_bruteforce(spark):
    (row,) = QUERIES["q_graph_assortativity"].fn(spark, SF_SMOKE).collect()
    edges = _edges_bruteforce(spark)
    deg = Counter()
    for x, y in edges:
        deg[x] += 1
        deg[y] += 1
    stubs = [(deg[x], deg[y]) for x, y in edges] + [
        (deg[y], deg[x]) for x, y in edges]
    n = len(stubs)
    sa = sum(a for a, _ in stubs)
    saa = sum(a * a for a, _ in stubs)
    sab = sum(a * b for a, b in stubs)
    r = (n * sab - sa * sa) / (n * saa - sa * sa)
    assert row["n_edges"] == len(edges)
    assert abs(row["assortativity"] - round(r, 6)) < 1e-5
    assert -1 - 1e-9 <= row["assortativity"] <= 1 + 1e-9


def test_powerlaw_alpha_matches_bruteforce(spark):
    (row,) = QUERIES["q_powerlaw_alpha"].fn(spark, SF_SMOKE).collect()
    edges = _edges_bruteforce(spark)
    deg = Counter()
    for x, y in edges:
        deg[x] += 1
        deg[y] += 1
    n = len(deg)
    s = sum(round(math.log(d / 0.5), 12) for d in deg.values())
    alpha = 1 + n / s
    assert row["n_vertices"] == n
    assert row["max_degree"] == max(deg.values())
    assert abs(row["alpha_mle"] - round(alpha, 6)) < 1e-5
    assert abs(row["alpha_se"] - round((alpha - 1) / math.sqrt(n), 6)) < 1e-5
    # MLE with dmin=1 is always > 1
    assert row["alpha_mle"] > 1

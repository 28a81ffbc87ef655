"""Wave-21 semantics: triangles, blocked sim-join, Bloom audit,
column profile."""

from __future__ import annotations

import biosets_spark.queries.wave21  # noqa: F401  (registers the wave)
from biosets_spark.queries import QUERIES
from tests.conftest import SF_SMOKE


def test_triangle_count_invariants(spark):
    r = QUERIES["q_triangle_count"].fn(spark, SF_SMOKE).collect()[0]
    assert r["n_edges"] > 0
    # every triangle contributes 3 wedges, so 3*tri <= wedges
    assert 3 * r["n_triangles"] <= r["n_wedges"]
    assert 0.0 <= r["clustering"] <= 1.0


def test_simjoin_blocked_pairs(spark):
    rows = QUERIES["q_simjoin_names"].fn(spark, SF_SMOKE).collect()
    assert rows
    for r in rows:
        assert r["name_a"] < r["name_b"]
        assert 0 < r["dist"] <= 10  # distinct names, bounded distance
        # blocking invariant: pairs share the first token
        assert r["name_a"].split(" ")[0] == r["name_b"].split(" ")[0]


def test_bloom_audit_one_sided_error(spark):
    r = QUERIES["q_bloom_audit"].fn(spark, SF_SMOKE).collect()[0]
    assert r["n_docs"] == r["n_test"] + (r["n_docs"] - r["n_test"])
    # no false negatives: every exact member is flagged
    assert r["n_flagged"] >= r["n_members"]
    # every test doc is its own exact member
    assert r["n_members"] >= r["n_test"]
    assert r["n_false_pos"] == r["n_flagged"] - r["n_members"]


def test_column_profile_against_direct_aggs(spark):
    rows = {r["col_name"]: r for r in QUERIES["q_column_profile"].fn(spark, SF_SMOKE).collect()}
    o = spark.read.parquet(f"{SF_SMOKE}/orders.parquet")
    n = o.count()
    assert set(rows) == {"o_orderkey", "o_custkey", "o_totalprice",
                         "o_orderdate", "o_orderpriority"}
    assert rows["o_orderkey"]["n_null"] == 0
    assert rows["o_orderkey"]["n_distinct"] == n  # primary key
    assert rows["o_orderpriority"]["n_distinct"] == 5
    # canonical date strings
    assert rows["o_orderdate"]["min_s"] < rows["o_orderdate"]["max_s"]
    assert len(rows["o_orderdate"]["min_s"]) == 10  # ISO yyyy-mm-dd

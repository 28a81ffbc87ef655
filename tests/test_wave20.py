"""Wave-20 semantics: centroid assignment, dup-graph degrees,
association-rule lift, interval-overlap aggregation."""

from __future__ import annotations

import biosets_spark.queries.wave20  # noqa: F401  (registers the wave)
from biosets_spark.queries import QUERIES
from tests.conftest import SF_SMOKE


def test_centroid_confusion_partitions_vectors(spark):
    rows = QUERIES["q_centroid_confusion"].fn(spark, SF_SMOKE).collect()
    emb = spark.read.parquet(f"{SF_SMOKE}/embeddings.parquet")
    n_vecs = emb.count()
    labels = {r["label"] for r in emb.select("label").distinct().collect()}
    # every vector assigned exactly once
    assert sum(r["n"] for r in rows) == n_vecs
    for r in rows:
        assert r["assigned"] in labels and r["label"] in labels
    # diagonal dominance: a vector's own label centroid should win more
    # often than chance (labels are embedding-correlated in testdata)
    diag = sum(r["n"] for r in rows if r["assigned"] == r["label"])
    assert diag / n_vecs > 1.0 / len(labels)


def test_dup_graph_degree_mass_matches_pairs(spark):
    from biosets_spark import tables
    from biosets_spark.operators import dedup as D

    docs = tables.load(spark, SF_SMOKE, "documents")
    n_pairs = D.ngram_jaccard_pairs(
        docs, n=4, threshold=0.5, max_shingle_df=50
    ).count()
    rows = QUERIES["q_dup_graph_degree"].fn(spark, SF_SMOKE).collect()
    # handshake lemma: sum(degree * n_docs) == 2 * |edges|
    assert sum(r["degree"] * r["n_docs"] for r in rows) == 2 * n_pairs


def test_lift_rules_values(spark):
    rows = QUERIES["q_lift_rules"].fn(spark, SF_SMOKE).collect()
    assert len(rows) == 20
    prev = None
    for r in rows:
        assert r["n_ab"] >= 2
        assert r["lift"] > 0
        assert r["part_a"] < r["part_b"]
        if prev is not None:
            assert r["lift"] <= prev + 1e-9  # sorted descending
        prev = r["lift"]


def test_interval_overlap_clipping(spark):
    rows = QUERIES["q_interval_overlap"].fn(spark, SF_SMOKE).collect()
    assert len(rows) == 12  # every 1996 month absorbs some open-order days
    for r in rows:
        # overlap per lineitem is clipped to the month length, so the
        # monthly total is bounded by n_lineitems * 31
        assert 0 < r["overlap_days"] <= r["n_lineitems"] * 31

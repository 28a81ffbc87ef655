"""Wave-22 semantics: n-gram novelty, funnel latency."""

from __future__ import annotations

import biosets_spark.queries.wave22  # noqa: F401  (registers the wave)
from biosets_spark.queries import QUERIES
from tests.conftest import SF_SMOKE


def test_ngram_novelty_bounds(spark):
    rows = QUERIES["q_ngram_novelty"].fn(spark, SF_SMOKE).collect()
    assert rows
    total_novel = sum(r["n_novel"] for r in rows)
    total_sh = sum(r["n_shingles"] for r in rows)
    # every distinct shingle is novel in exactly one document, so the
    # corpus-wide novel count equals the number of distinct shingles
    assert 0 < total_novel <= total_sh
    for r in rows:
        assert 0.0 < r["novelty_rate"] <= 1.0
        assert r["n_novel"] <= r["n_shingles"]


def test_ngram_novelty_first_doc_is_fully_novel(spark):
    # the lowest doc_id in the corpus can only contain first-seen
    # shingles -> its per-doc novelty is 1.0 by construction
    from pyspark.sql import functions as F

    from biosets_spark.operators.dedup import shingle_table

    docs = spark.read.parquet(f"{SF_SMOKE}/documents.parquet")
    min_id = docs.agg(F.min("doc_id")).collect()[0][0]
    sh = shingle_table(docs, text_col="text", id_col="doc_id", n=4)
    first = sh.groupBy("_sh").agg(F.min("_id").alias("first_doc"))
    mine = sh.filter(F.col("_id") == min_id).join(first, "_sh")
    assert mine.filter(F.col("first_doc") != min_id).count() == 0


def test_funnel_latency_positive_and_ordered(spark):
    r = QUERIES["q_funnel_latency"].fn(spark, SF_SMOKE).collect()[0]
    assert r["n_converted"] > 0
    assert 0 <= r["p50_minutes"] <= r["p90_minutes"]


def test_referential_audit_rows(spark):
    import biosets_spark.queries.wave23  # noqa: F401

    rows = {r["check_name"]: r["n_violations"]
            for r in QUERIES["q_referential_audit"].fn(spark, SF_SMOKE).collect()}
    assert set(rows) == {"orphan_lineitems", "childless_orders",
                         "orders_unknown_customer", "bad_lineitem_values"}
    # TPC-H-shaped data: clean keys except orders with no lineitems
    assert rows["orphan_lineitems"] == 0
    assert rows["bad_lineitem_values"] == 0
    assert rows["childless_orders"] > 0


def test_crosslingual_dup_unordered_pairs(spark):
    import biosets_spark.queries.wave23  # noqa: F401

    rows = QUERIES["q_crosslingual_dup"].fn(spark, SF_SMOKE).collect()
    assert rows
    for r in rows:
        assert r["lang_a"] <= r["lang_b"]  # unordered pair canonicalized
        assert r["n_pairs"] > 0
    # the testdata contains cross-lingual template mass (off-diagonal)
    assert any(r["lang_a"] != r["lang_b"] for r in rows)

"""Wave-36 semantics: shard-layout audit, Cohen's kappa."""

from __future__ import annotations

from collections import Counter

import biosets_spark.queries.wave36  # noqa: F401  (registers the wave)
from biosets_spark.queries import QUERIES
from tests.conftest import SF_SMOKE


def test_shard_assignment_partitions_all_docs(spark):
    rows = QUERIES["q_shard_assignment"].fn(spark, SF_SMOKE).collect()
    docs = spark.read.parquet(f"{SF_SMOKE}/documents.parquet")
    n_docs = docs.count()
    total_chars = sum(r["n_chars"] for r in docs.select("n_chars").collect())
    # shards partition the corpus exactly: nothing dropped, nothing
    # double-counted
    assert sum(r["n_docs"] for r in rows) == n_docs
    assert sum(r["total_chars"] for r in rows) == total_chars
    assert all(0 <= r["shard"] < 64 for r in rows)
    assert len({r["shard"] for r in rows}) == len(rows)
    # md5 balances the id space: every populated shard within 3x of
    # ideal on docs (loose bound, deterministic data)
    assert all(0 < r["doc_balance"] < 3 for r in rows)
    # rerun yields the identical layout (deterministic assignment)
    again = QUERIES["q_shard_assignment"].fn(spark, SF_SMOKE).collect()
    assert sorted(map(tuple, rows)) == sorted(map(tuple, again))


def test_cohens_kappa_matches_confusion_matrix(spark):
    import biosets_spark.queries.wave12  # noqa: F401

    (row,) = QUERIES["q_cohens_kappa"].fn(spark, SF_SMOKE).collect()
    conf = QUERIES["q_langid_confusion"].fn(spark, SF_SMOKE).collect()
    n = sum(r["n"] for r in conf)
    agree = sum(r["n"] for r in conf if r["lang"] == r["lang_pred"])
    rm = Counter(); cm = Counter()
    for r in conf:
        rm[r["lang"]] += r["n"]
        cm[r["lang_pred"]] += r["n"]
    pe = sum(rm[k] * cm[k] for k in rm if k in cm) / (n * n)
    po = agree / n
    assert row["n_docs"] == n
    assert abs(row["observed_agreement"] - round(po, 6)) < 1e-6
    assert abs(row["expected_agreement"] - round(pe, 6)) < 1e-6
    assert abs(row["kappa"] - round((po - pe) / (1 - pe), 6)) < 1e-5
    # kappa is bounded and below raw agreement (chance correction)
    assert -1 <= row["kappa"] <= 1
    assert row["kappa"] <= row["observed_agreement"] + 1e-9

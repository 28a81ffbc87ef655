"""Two full user journeys, end to end, through the public API only —
the workflows a reference user actually runs, chained the way the
reference's docs chain them (docs/DATA_LOADING.md + PROCESSING.md):

1. omics-style: discover CSVs + metadata -> filter/map -> stratified
   train_test_split -> save_to_disk -> load_from_disk, roles intact.
2. corpus-style: documents parquet -> quality gate -> exact dedup ->
   near-dup pair removal -> deterministic split -> save, with the
   survivor count reconciling against the operators run standalone.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from biosets_spark import load_dataset, load_from_disk
from biosets_spark.dataset import BioDataset
from tests.conftest import SF_SMOKE


def test_omics_journey(spark, fixture_dir, tmp_path):
    ds = load_dataset(path=fixture_dir, spark=spark)
    # row-level processing through the public surface
    ds2 = (
        ds.filter(F.col("header1") >= 2)
        .map(exprs={"h1_sq": F.col("header1") * F.col("header1")})
        .rename_column("metadata1", "meta_a")
    )
    assert ds2.num_rows == 3
    assert ds2.head(1)[0]["h1_sq"] in {4, 9, 16}
    # split -> dict -> save -> reload
    dd = ds2.train_test_split(test_size=0.34, seed=7)
    assert set(dd.keys()) == {"train", "test"}
    n_train, n_test = dd["train"].num_rows, dd["test"].num_rows
    assert n_train + n_test == 3 and n_test >= 1
    out = str(tmp_path / "omics_ds")
    dd.save_to_disk(out)
    back = load_from_disk(spark, out)
    assert back["train"].num_rows == n_train
    assert back["test"].num_rows == n_test
    # role metadata survives the round trip
    assert back["train"].get_sample_col_name() == "sample"
    assert "encoded_labels" in back["train"].columns


def test_corpus_journey(spark, tmp_path):
    from biosets_spark.operators import dedup as D
    from biosets_spark.operators.text import gopher_rules

    docs = spark.read.parquet(f"{SF_SMOKE}/documents.parquet")
    n0 = docs.count()

    # 1. quality gate (pure expressions)
    gated = gopher_rules(docs, text_col="text").filter(F.col("gopher_keep")) \
        .select(*docs.columns)
    n1 = gated.count()
    assert 0 < n1 < n0

    # 2. exact dedup: keep the min-id representative per fingerprint
    keep = D.exact_dedup(gated, text_col="text", id_col="doc_id") \
        .select(F.col("keep_id").alias("doc_id"))
    exact = gated.join(keep, "doc_id", "left_semi")
    n2 = exact.count()
    assert n2 <= n1

    # 3. near-dup removal: drop the higher id of every bounded-Jaccard pair
    pairs = D.ngram_jaccard_pairs(exact, n=4, threshold=0.5, max_shingle_df=50)
    drop = pairs.select(F.col("id_b").alias("doc_id")).distinct()
    clean = exact.join(drop, "doc_id", "left_anti")
    n3 = clean.count()
    assert n3 == n2 - drop.count()

    # 4. deterministic split + save through the BioDataset surface
    ds = BioDataset(clean)
    dd = ds.train_test_split(test_size=0.2, seed=13)
    assert dd["train"].num_rows + dd["test"].num_rows == n3
    out = str(tmp_path / "corpus_ds")
    dd.save_to_disk(out)
    back = load_from_disk(spark, out)
    assert back["train"].num_rows == dd["train"].num_rows
    # the split is deterministic: same seed -> same membership
    dd2 = ds.train_test_split(test_size=0.2, seed=13)
    a = {r["doc_id"] for r in dd["test"].df.select("doc_id").collect()}
    b = {r["doc_id"] for r in dd2["test"].df.select("doc_id").collect()}
    assert a == b

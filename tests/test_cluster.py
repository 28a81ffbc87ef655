"""operators/cluster.py: exact-grid k-means and SemDeDup semantic
dedup — boundary exactness, planted structure, determinism, and the
empty-cell fallback."""

import pytest

from biosets_spark.operators.cluster import (
    OFFSET,
    kmeans_fit,
    prune_farthest,
    semantic_dedup_stats,
    semantic_dup_pairs,
)


def _emb(spark, rows):
    return spark.createDataFrame(
        [(i, [float(x) for x in v]) for i, v in rows],
        "vec_id long, embedding array<double>")


def test_threshold_boundary_is_exact_inclusive(spark):
    # cos((1,0), (0.6,0.8)) == 0.6 EXACTLY on the 1e-6 grid:
    # dot = 6e11, |a|^2 = 1e12, |b|^2 = 1e12, and
    # dot^2 * 25 == 9 * |a|^2 * |b|^2 holds with equality.
    df = _emb(spark, [(1, (1.0, 0.0)), (2, (0.6, 0.8))])
    on = semantic_dup_pairs(df, k=1, threshold_num=3, threshold_den=5)
    assert [(r.id_a, r.id_b) for r in on.collect()] == [(1, 2)]
    # one grid step past the boundary excludes the pair — the compare
    # is exact integer arithmetic, not a float that could absorb 1 ulp
    off = semantic_dup_pairs(
        df, k=1, threshold_num=600001, threshold_den=1000000)
    assert off.collect() == []


def test_negative_dot_never_duplicates(spark):
    df = _emb(spark, [(1, (1.0, 0.0)), (2, (-1.0, 0.0))])
    assert semantic_dup_pairs(df, k=1).collect() == []


def test_threshold_validation(spark):
    df = _emb(spark, [(1, (1.0, 0.0))])
    with pytest.raises(ValueError, match="threshold"):
        semantic_dup_pairs(df, k=1, threshold_num=0, threshold_den=1)
    with pytest.raises(ValueError, match="threshold"):
        semantic_dup_pairs(df, k=1, threshold_num=3, threshold_den=2)


def test_kmeans_separates_planted_blobs(spark):
    # two tight blobs around (+1, +1) and (-1, -1); k=2 must put each
    # blob in its own cell regardless of which rows seed the sample
    rows = []
    for i in range(8):
        eps = i * 1e-3
        rows.append((i, (1.0 + eps, 1.0 - eps)))
        rows.append((100 + i, (-1.0 - eps, -1.0 + eps)))
    df = _emb(spark, rows)
    assigned, cents = kmeans_fit(df, k=2, iters=2)
    got = {r["vec_id"]: r["_cell"] for r in assigned.collect()}
    pos_cells = {c for v, c in got.items() if v < 100}
    neg_cells = {c for v, c in got.items() if v >= 100}
    assert len(pos_cells) == 1 and len(neg_cells) == 1
    assert pos_cells != neg_cells
    # fitted centroids sit on the blob means (offset space, 1e-6 grid)
    assert len(cents) == 2
    for cv in cents:
        raw = [c - OFFSET for c in cv]
        assert all(abs(abs(x) - 1_000_000) < 10_000 for x in raw)


def test_kmeans_deterministic(spark):
    df = _emb(spark, [(i, (i * 0.01, 1.0 - i * 0.01, 0.5)) for i in range(30)])
    a1, c1 = kmeans_fit(df, k=4, iters=2)
    a2, c2 = kmeans_fit(df, k=4, iters=2)
    assert c1 == c2
    assert sorted(map(tuple, a1.select("vec_id", "_cell").collect())) == \
           sorted(map(tuple, a2.select("vec_id", "_cell").collect()))


def test_kmeans_empty_cell_keeps_previous_centroid(spark):
    # two distinct points, k=3: the sample must contain a duplicate
    # centroid, whose cell goes empty on assignment (ties go to the
    # lower cell id) — the M-step's fallback keeps it in the model
    df = _emb(spark, [(1, (1.0, 0.0)), (2, (-1.0, 0.0)),
                      (3, (1.0, 0.0)), (4, (-1.0, 0.0))])
    assigned, cents = kmeans_fit(df, k=3, iters=2)
    assert len(cents) == 3
    cells = {r["_cell"] for r in assigned.collect()}
    assert len(cells) == 2  # one cell stayed empty, no crash


def test_semantic_stats_keep_lowest_id(spark):
    # ids 1, 2, 3 mutually identical -> 3 pairs, 2 pruned (2 and 3
    # each have a smaller-id duplicate; 1 is the keeper)
    df = _emb(spark, [(1, (1.0, 0.0)), (2, (1.0, 0.0)), (3, (1.0, 0.0)),
                      (4, (0.0, 1.0))])
    s = {r["cell"]: (r["n_docs"], r["n_pairs"], r["n_pruned"])
         for r in semantic_dedup_stats(df, k=1).collect()}
    assert s == {0: (4, 3, 2)}


def test_prune_farthest_drops_exact_outlier_tail(spark):
    # one blob at the origin + two far outliers: k=1 cell, prune 1/4
    # of 8 = 2 rows — exactly the two farthest by (dist DESC, id DESC)
    rows = [(i, (i * 1e-4, 0.0)) for i in range(6)]
    rows += [(100, (0.9, 0.9)), (101, (-0.9, -0.9))]
    df = _emb(spark, rows)
    assigned, _ = kmeans_fit(df, k=1, iters=1)
    out = prune_farthest(assigned, frac_num=1, frac_den=4)
    dropped = sorted(r["vec_id"] for r in out.collect() if not r["_keep"])
    assert dropped == [100, 101]


def test_prune_fraction_zero_keeps_all(spark):
    df = _emb(spark, [(i, (i * 0.1, 0.0)) for i in range(5)])
    assigned, _ = kmeans_fit(df, k=1, iters=1)
    out = prune_farthest(assigned, frac_num=0, frac_den=4)
    assert all(r["_keep"] for r in out.collect())


def test_prune_fraction_validation(spark):
    df = _emb(spark, [(1, (1.0, 0.0))])
    assigned, _ = kmeans_fit(df, k=1, iters=0)
    with pytest.raises(ValueError, match="fraction"):
        prune_farthest(assigned, frac_num=4, frac_den=4)


def test_assignment_kernel_matches_literal_path(spark):
    # the large-k BLAS kernel must produce bit-identical (_cell,
    # _dist) to the literal-centroid JVM expression — same exact
    # integers, same lowest-cell tie-break
    from biosets_spark.operators.cluster import (
        _assign_cells_kernel,
        assign_cells,
        sample_centroids,
        scaled_vec,
    )
    from pyspark.sql.functions import col

    rows = [(i, ((i % 17) * 0.07 - 0.5, (i % 13) * 0.05 - 0.3,
                 (i % 7) * 0.11 - 0.4)) for i in range(120)]
    df = _emb(spark, rows)
    v = df.select(col("vec_id").alias("_id"),
                  scaled_vec(col("embedding")).alias("_v"))
    cents = sample_centroids(v, 32, "_id", "_v")
    lit_map = {r["_id"]: (r["_cell"], r["_dist"])
               for r in assign_cells(v, cents).collect()}
    ker_map = {r["_id"]: (r["_cell"], r["_dist"])
               for r in _assign_cells_kernel(v, cents, "_v").collect()}
    assert lit_map == ker_map
    # modular vectors produce exact duplicates -> exact distance ties;
    # both paths must break them toward the lowest cell
    assert len(lit_map) == 120


def test_semantic_pairs_large_k_kernel_path(spark):
    # k > 64 routes assignment through the BLAS kernel; planted exact
    # duplicates must still pair up
    rows = [(i, (0.3 + (i % 40) * 0.01, 0.7 - (i % 40) * 0.01))
            for i in range(100)]
    rows += [(500, (0.123456, 0.654321)), (501, (0.123456, 0.654321))]
    df = _emb(spark, rows)
    pairs = {(r.id_a, r.id_b) for r in semantic_dup_pairs(
        df, k=80, threshold_num=999999, threshold_den=1000000).collect()}
    assert (500, 501) in pairs


def test_curated_corpus_drops_semantic_dups(spark):
    # docs 1 and 2 pass quality with DIFFERENT texts (exact dedup
    # keeps both) but identical embeddings -> the semantic stage drops
    # the higher id; doc 3 is semantically distinct and survives
    from biosets_spark.operators.pipeline import curated_corpus

    good = ("this is a perfectly reasonable document with enough "
            "tokens to pass the quality gate without trouble")
    docs = spark.createDataFrame(
        [(1, good + " one"), (2, good + " two"), (3, good + " three")],
        "doc_id long, text string")
    emb = _emb(spark, [(1, (1.0, 0.0)), (2, (1.0, 0.0)),
                       (3, (0.0, 1.0))])
    kept = sorted(r["doc_id"] for r in curated_corpus(
        docs, emb, k=1, threshold_num=99, threshold_den=100).collect())
    assert kept == [1, 3]


def test_semantic_pairs_are_within_cell_only(spark):
    # two identical vectors forced into DIFFERENT cells by k=2
    # centroids sampled from two well-separated groups: SemDeDup's
    # documented recall trade — the cross-cell pair is not compared
    df = _emb(spark, [(1, (1.0, 0.05)), (2, (-1.0, 0.0)),
                      (3, (1.0, -0.05))])
    pairs = semantic_dup_pairs(df, k=2, threshold_num=99,
                               threshold_den=100)
    rows = pairs.collect()
    pairs_set = {(r.id_a, r.id_b) for r in rows}
    # the near-identical 1/3 pair lands in different cells, so the
    # within-cell-only contract must suppress it
    assert (1, 3) not in pairs_set and (3, 1) not in pairs_set
    for r in rows:
        assert r.cell is not None

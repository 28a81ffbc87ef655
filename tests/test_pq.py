"""Product-quantization operators (operators/pq.py): grid-exact
encode/ADC invariants pinned against driver-side recomputation."""

import math
import random

import pytest
from pyspark.sql import functions as F

from biosets_spark.operators import pq as PQ
from biosets_spark.operators.cluster import SCALE


@pytest.fixture()
def vecs(spark):
    rnd = random.Random(7)
    rows = [(i, [rnd.uniform(-0.5, 0.5) for _ in range(8)]) for i in range(40)]
    return rows, spark.createDataFrame(rows, "vec_id long, embedding array<double>")


def _grid(v):
    return [int(math.floor(x * SCALE + 0.5)) for x in v]


def test_pq_encode_matches_bruteforce(vecs):
    rows, df = vecs
    cbs = PQ.pq_codebooks(df, m=2, n_codes=4)
    got = {r.vec_id: list(r.pq_code) for r in PQ.pq_encode(df, cbs).collect()}
    dsub = 4
    for vid, v in rows:
        g = _grid(v)
        for j in range(2):
            sub = g[j * dsub:(j + 1) * dsub]
            dists = [
                sum((a - b) ** 2 for a, b in zip(sub, cv))
                for cv in cbs[j]
            ]
            # first-minimum tie rule
            want = dists.index(min(dists))
            assert got[vid][j] == want, (vid, j)


def test_pq_adc_score_is_exact_table_sum(vecs):
    rows, df = vecs
    cbs = PQ.pq_codebooks(df, m=2, n_codes=4)
    enc = PQ.pq_encode(df, cbs)
    q = rows[3][1]
    table = PQ.pq_distance_table(cbs, q)
    out = {r.neighbor_id: r.adc_score
           for r in PQ.pq_adc_topk(enc, cbs, q, k=40).collect()}
    codes = {r.vec_id: list(r.pq_code) for r in enc.collect()}
    for vid, score in out.items():
        want = sum(table[j][codes[vid][j]] for j in range(2))
        assert score == want


def test_pq_adc_ranks_self_dup_at_minimal_score(spark):
    """A planted exact duplicate of the query row must carry the
    MINIMAL ADC score (identical codes -> identical table sum). ADC is
    quantized, so other rows sharing the query's codes tie with it —
    the assertion is score-minimality, not strict first place."""
    rnd = random.Random(11)
    base = [rnd.uniform(-0.5, 0.5) for _ in range(8)]
    rows = [(i, [rnd.uniform(-0.5, 0.5) for _ in range(8)]) for i in range(1, 30)]
    rows += [(0, base), (99, list(base))]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    cbs = PQ.pq_codebooks(df, m=2, n_codes=4)
    enc = PQ.pq_encode(df, cbs)
    full = PQ.pq_adc_topk(enc, cbs, base, k=30, exclude_self=0).collect()
    scores = {r.neighbor_id: r.adc_score for r in full}
    assert scores[99] == min(scores.values())
    assert 0 not in scores  # exclude_self applied


def test_pq_codebooks_rejects_ragged_split(vecs):
    _, df = vecs
    with pytest.raises(ValueError, match="not divisible"):
        PQ.pq_codebooks(df, m=3, n_codes=4)


def test_pq_encode_deterministic_across_runs(vecs):
    _, df = vecs
    cbs = PQ.pq_codebooks(df, m=4, n_codes=8)
    a = sorted((r.vec_id, tuple(r.pq_code))
               for r in PQ.pq_encode(df, cbs).collect())
    b = sorted((r.vec_id, tuple(r.pq_code))
               for r in PQ.pq_encode(df.repartition(7), cbs).collect())
    assert a == b


def test_pq_code_column_is_small(vecs):
    _, df = vecs
    cbs = PQ.pq_codebooks(df, m=4, n_codes=8)
    enc = PQ.pq_encode(df, cbs)
    f = enc.schema["pq_code"]
    assert f.dataType.simpleString() == "array<smallint>"
    assert enc.select(F.max(F.size("pq_code"))).first()[0] == 4


def test_pq_adc_rerank_full_shortlist_equals_exact(vecs):
    """With shortlist >= corpus size the ADC stage prunes nothing, so
    ADC+R must equal the exact grid-L2 top-k (order and distances)."""
    rows, df = vecs
    cbs = PQ.pq_codebooks(df, m=2, n_codes=4)
    enc = PQ.pq_encode(df, cbs)
    q = rows[5][1]
    got = [(r.neighbor_id, r.dist) for r in
           PQ.pq_adc_rerank_topk(enc, cbs, q, df, k=5, shortlist=100,
                                 exclude_self=5).collect()]
    qg = _grid(q)
    want = sorted(
        (sum((a - b) ** 2 for a, b in zip(_grid(v), qg)), vid)
        for vid, v in rows if vid != 5
    )[:5]
    assert got == [(vid, d) for d, vid in want]


def test_pq_train_reduces_total_distortion(vecs):
    """Lloyd monotonicity: one training iteration cannot increase the
    exact total quantization distortion, and on this random corpus it
    strictly decreases it."""
    rows, df = vecs
    cbs0 = PQ.pq_codebooks(df, m=2, n_codes=4)
    cbs1 = PQ.pq_train_codebooks(df, m=2, n_codes=4, iters=1)

    def total(cbs):
        enc = PQ.pq_encode(df, cbs, dist_col="pq_dist")
        return enc.select(F.explode("pq_dist").alias("d")).agg(
            F.sum("d")).first()[0]

    t0, t1 = total(cbs0), total(cbs1)
    assert t1 < t0


def test_pq_train_matches_driver_lloyd(vecs):
    """The distributed M-step (posexplode aggregate + half-up floor-div
    mean) reproduces a driver-side reimplementation exactly — the
    signed-space twin of the oracle's offset-space CTEs."""
    rows, df = vecs
    m, n_codes, dsub = 2, 4, 4
    got = PQ.pq_train_codebooks(df, m=m, n_codes=n_codes, iters=2)

    cbs = PQ.pq_codebooks(df, m=m, n_codes=n_codes)
    grids = {vid: _grid(v) for vid, v in rows}
    for _ in range(2):
        sums = {}
        for vid, g in grids.items():
            for j in range(m):
                sub = g[j * dsub:(j + 1) * dsub]
                dists = [sum((a - b) ** 2 for a, b in zip(sub, cv))
                         for cv in cbs[j]]
                c = dists.index(min(dists))
                s, n = sums.get((j, c), ([0] * dsub, 0))
                sums[(j, c)] = ([a + b for a, b in zip(s, sub)], n + 1)
        cbs = [
            [
                [(2 * sums[(j, c)][0][p] + sums[(j, c)][1])
                 // (2 * sums[(j, c)][1]) for p in range(dsub)]
                if (j, c) in sums else list(cv)
                for c, cv in enumerate(cb)
            ]
            for j, cb in enumerate(cbs)
        ]
    assert got == cbs


def test_pq_encode_dist_col_is_exact(vecs):
    rows, df = vecs
    cbs = PQ.pq_codebooks(df, m=2, n_codes=4)
    enc = {r.vec_id: (list(r.pq_code), list(r.pq_dist))
           for r in PQ.pq_encode(df, cbs, dist_col="pq_dist").collect()}
    dsub = 4
    for vid, v in rows:
        g = _grid(v)
        codes, dists = enc[vid]
        for j in range(2):
            sub = g[j * dsub:(j + 1) * dsub]
            want = sum((a - b) ** 2 for a, b in zip(sub, cbs[j][codes[j]]))
            assert dists[j] == want


def test_ivfpq_probe_restricts_scan_and_scores_exactly(vecs):
    """ivfpq_adc_topk only scores rows in the probed cells, with the
    exact ADC table sums; probing ALL cells recovers plain pq_adc_topk."""
    rows, df = vecs
    encoded, cents, cbs = PQ.ivfpq_build(
        df, n_cells=4, m=2, n_codes=4, train_iters=1, cell_seed=7)
    q = rows[5][1]
    got = PQ.ivfpq_adc_topk(encoded, cents, cbs, q, k=40, n_probe=2,
                            exclude_self=5).collect()
    # probed cells, recomputed driver-side
    qg = _grid(q)
    ranked = sorted(
        (sum((a - b) ** 2 for a, b in zip(qg, cv)), ci)
        for ci, cv in enumerate(cents))
    probe = {ci for _, ci in ranked[:2]}
    cells = {r.vec_id: r._cell for r in encoded.collect()}
    assert {r.neighbor_id for r in got} == {
        vid for vid, _ in rows if cells[vid] in probe and vid != 5}
    # full probe == plain ADC over everything
    full = PQ.ivfpq_adc_topk(encoded, cents, cbs, q, k=10, n_probe=4,
                             exclude_self=5).collect()
    enc_all = PQ.pq_encode(df, cbs)
    plain = PQ.pq_adc_topk(enc_all, cbs, q, k=10, exclude_self=5).collect()
    assert [(r.neighbor_id, r.adc_score) for r in full] == \
           [(r.neighbor_id, r.adc_score) for r in plain]


def test_pq_train_empty_code_keeps_previous_entry(spark):
    """A codebook entry that attracts no vectors must survive training
    unchanged (the oracle's COALESCE over the LEFT JOIN)."""
    # only TWO distinct vectors over 15 rows: the 4 md5-sampled
    # codebook entries must contain duplicates (pigeonhole), and the
    # ties-to-lowest-code rule starves every later duplicate entry
    rows = [(i, [-0.4 if i % 2 else 0.4] * 4) for i in range(15)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    cbs0 = PQ.pq_codebooks(df, m=2, n_codes=4)
    cbs1 = PQ.pq_train_codebooks(df, m=2, n_codes=4, iters=1)
    # recompute assignment driver-side to find empty codes
    grids = {vid: _grid(v) for vid, v in rows}
    used = {j: set() for j in range(2)}
    for g in grids.values():
        for j in range(2):
            sub = g[j * 2:(j + 1) * 2]
            dists = [sum((a - b) ** 2 for a, b in zip(sub, cv))
                     for cv in cbs0[j]]
            used[j].add(dists.index(min(dists)))
    empties = [(j, c) for j in range(2) for c in range(4)
               if c not in used[j]]
    assert empties, "fixture must leave at least one empty code"
    for j, c in empties:
        assert cbs1[j][c] == cbs0[j][c]


def test_ivfpq_residual_scores_match_driver(vecs):
    """by_residual=True: codes quantize v - centroid(cell); ADC scores
    use the PER-CELL query residual table. Full-probe scan recomputed
    driver-side in exact ints."""
    rows, df = vecs
    encoded, cents, cbs = PQ.ivfpq_build(
        df, n_cells=4, m=2, n_codes=4, train_iters=1, by_residual=True)
    q = rows[9][1]
    got = {r.neighbor_id: r.adc_score
           for r in PQ.ivfpq_adc_topk(encoded, cents, cbs, q, k=40,
                                      n_probe=4, by_residual=True).collect()}
    qg = _grid(q)
    enc_rows = encoded.collect()
    cells = {r.vec_id: r._cell for r in enc_rows}
    codes = {r.vec_id: list(r.pq_code) for r in enc_rows}
    dsub = 4
    for vid, _ in rows:
        c = cells[vid]
        qr = [qg[p] - cents[c][p] for p in range(8)]
        want = sum(
            sum((qr[j * dsub + p] - cbs[j][codes[vid][j]][p]) ** 2
                for p in range(dsub))
            for j in range(2))
        assert got[vid] == want, vid


def test_ivfpq_residual_codes_quantize_residuals(vecs):
    """The stored codes must be the argmin in RESIDUAL space (a raw-
    space argmin would differ for rows whose cell centroid is far from
    the origin)."""
    rows, df = vecs
    encoded, cents, cbs = PQ.ivfpq_build(
        df, n_cells=4, m=2, n_codes=4, train_iters=0, by_residual=True)
    enc_rows = encoded.collect()
    cells = {r.vec_id: r._cell for r in enc_rows}
    codes = {r.vec_id: list(r.pq_code) for r in enc_rows}
    dsub = 4
    for vid, v in rows:
        g = _grid(v)
        res = [g[p] - cents[cells[vid]][p] for p in range(8)]
        for j in range(2):
            sub = res[j * dsub:(j + 1) * dsub]
            dists = [sum((a - b) ** 2 for a, b in zip(sub, cv))
                     for cv in cbs[j]]
            assert codes[vid][j] == dists.index(min(dists)), (vid, j)

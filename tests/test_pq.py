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

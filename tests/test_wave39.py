"""Wave-39 semantics: deterministic rarefaction, core prevalence."""

from __future__ import annotations

import biosets_spark.queries.wave39  # noqa: F401  (registers the wave)
from biosets_spark.queries import QUERIES
from biosets_spark.queries.wave39 import _DEPTH, _MAX_ORDER
from tests.conftest import SF_SMOKE


def test_rarefaction_bounds_and_determinism(spark):
    rows = QUERIES["q_rarefaction"].fn(spark, SF_SMOKE).collect()
    assert rows
    for r in rows:
        # depth gate: only samples with >= DEPTH reads survive
        assert r["n_reads"] >= _DEPTH
        # rarefied richness can't exceed the subsample size, the raw
        # richness, or be zero
        assert 1 <= r["rarefied_richness"] <= min(_DEPTH, r["raw_richness"])
    # depth-equalization: a rerun picks the identical subsample
    again = QUERIES["q_rarefaction"].fn(spark, SF_SMOKE).collect()
    assert sorted(map(tuple, rows)) == sorted(map(tuple, again))
    # reads reconcile with the source quantities
    li = spark.read.parquet(f"{SF_SMOKE}/lineitem.parquet")
    from pyspark.sql import functions as F

    depths = {
        r["l_orderkey"]: r["q"]
        for r in li.filter(F.col("l_orderkey") <= _MAX_ORDER)
        .groupBy("l_orderkey")
        .agg(F.sum(F.col("l_quantity").cast("long")).alias("q"))
        .collect()
    }
    for r in rows:
        assert r["n_reads"] == depths[r["l_orderkey"]]


def test_core_prevalence_matches_bruteforce(spark):
    rows = QUERIES["q_core_prevalence"].fn(spark, SF_SMOKE).collect()
    li = spark.read.parquet(f"{SF_SMOKE}/lineitem.parquet").collect()
    pres = {}
    samples = set()
    for x in li:
        if x["l_orderkey"] <= _MAX_ORDER:
            samples.add(x["l_orderkey"])
            pres.setdefault(x["l_partkey"], set()).add(x["l_orderkey"])
    counts = sorted(
        ((len(v), -k) for k, v in pres.items()), reverse=True
    )[:20]
    expect = [(-k, n) for n, k in counts]
    got = [(r["l_partkey"], r["n_present"]) for r in rows]
    assert got == expect
    for r in rows:
        assert r["n_samples"] == len(samples)
        assert abs(r["prevalence"] - (r["n_present"] / len(samples))) < 1e-06

"""Wave-56 semantics: diff-in-diff, capture-recapture."""

from __future__ import annotations

import datetime
import hashlib
import math
from collections import defaultdict

import biosets_spark.queries.wave56  # noqa: F401  (registers the wave)
from biosets_spark.queries import QUERIES
from tests.conftest import SF_SMOKE


def test_diff_in_diff_matches_bruteforce(spark):
    (row,) = QUERIES["q_diff_in_diff"].fn(spark, SF_SMOKE).collect()
    li = spark.read.parquet(f"{SF_SMOKE}/lineitem.parquet").collect()
    ptype = {p["p_partkey"]: p["p_type"]
             for p in spark.read.parquet(f"{SF_SMOKE}/part.parquet").collect()}
    cut = datetime.datetime(1997, 1, 1)
    cells = defaultdict(list)
    for x in li:
        treated = ptype[x["l_partkey"]].startswith("PROMO")
        post = x["l_shipdate"] >= cut
        cells[(treated, post)].append(int(x["l_quantity"]))
    means = {k: sum(v) / len(v) for k, v in cells.items()}
    did = (means[(True, True)] - means[(True, False)]) - (
        means[(False, True)] - means[(False, False)])
    n_all = sum(len(v) for v in cells.values())
    ssw = sum(
        sum(y * y for y in v) - sum(v) ** 2 / len(v) for v in cells.values())
    se = math.sqrt(ssw / (n_all - 4) * sum(1 / len(v) for v in cells.values()))
    assert row["n_rows"] == n_all
    assert abs(row["treated_pre"] - round(means[(True, False)], 6)) < 1e-6
    assert abs(row["control_post"] - round(means[(False, True)], 6)) < 1e-6
    assert abs(row["did_estimate"] - round(did, 6)) < 1e-5
    assert abs(row["did_se"] - round(se, 6)) < 1e-5
    # the DiD identity holds against its own reported cells
    recon = (row["treated_post"] - row["treated_pre"]) - (
        row["control_post"] - row["control_pre"])
    assert abs(recon - row["did_estimate"]) < 5e-6


def test_capture_recapture_matches_bruteforce(spark):
    (row,) = QUERIES["q_capture_recapture"].fn(spark, SF_SMOKE).collect()
    docs = spark.read.parquet(f"{SF_SMOKE}/documents.parquet").collect()
    n1 = n2 = m = 0
    for d in docs:
        h = hashlib.md5(str(d["doc_id"]).encode()).hexdigest()
        a = int(h[:15], 16) % 10 < 3
        b = int(h[15:30], 16) % 10 < 3
        n1 += a
        n2 += b
        m += a and b
    n_true = len(docs)
    chapman = (n1 + 1) * (n2 + 1) / (m + 1) - 1
    assert (row["capture_1"], row["capture_2"], row["recaptured"]) == (n1, n2, m)
    assert row["true_population"] == n_true
    assert abs(row["chapman_estimate"] - round(chapman, 6)) < 1e-6
    assert abs(row["relative_error"]
               - round((chapman - n_true) / n_true, 6)) < 1e-6
    # independent ~30% samples estimate the truth within a few
    # sigma of the 1/sqrt(m) error scale
    assert abs(row["relative_error"]) < 5 / math.sqrt(max(m, 1))

"""Wave-66 semantics: embedding anisotropy, session conversion."""

from __future__ import annotations

import math
from collections import defaultdict

import biosets_spark.queries.wave66 as w66  # noqa: F401  (registers the wave)
from biosets_spark.queries import QUERIES
from tests.conftest import SF_SMOKE


def test_anisotropy_matches_pairwise_bruteforce(spark):
    """The centroid identity must equal the O(n^2) mean pairwise
    cosine computed directly (up to the component quantization)."""
    rows = {r["label"]: r
            for r in QUERIES["q_embedding_anisotropy"].fn(spark, SF_SMOKE).collect()}
    embs = spark.read.parquet(f"{SF_SMOKE}/embeddings.parquet").collect()
    by_label = defaultdict(list)
    for e in embs:
        v = [round(float(x), 6) for x in e["embedding"]]
        l2 = math.sqrt(sum(round(x * x, 12) for x in v))
        by_label[e["label"]].append([round(x / l2, 8) for x in v])
    for lbl, us in by_label.items():
        n = len(us)
        # brute-force mean pairwise cosine
        total = 0.0
        for i in range(n):
            for j in range(n):
                if i != j:
                    total += sum(a * b for a, b in zip(us[i], us[j]))
        mean_cos = total / (n * (n - 1))
        r = rows[lbl]
        assert r["n_vectors"] == n
        assert abs(r["mean_pairwise_cosine"] - mean_cos) < 1e-4
        assert -1 <= r["mean_pairwise_cosine"] <= 1
        # centroid norm consistency: ||mean u||^2 ~ (1 + (n-1)*cos)/n
        assert abs(r["centroid_norm"] ** 2
                   - (1 + (n - 1) * mean_cos) / n) < 1e-3


def test_session_conversion_matches_bruteforce(spark):
    (row,) = QUERIES["q_session_conversion"].fn(spark, SF_SMOKE).collect()
    events = spark.read.parquet(f"{SF_SMOKE}/events.parquet").collect()
    by_user = defaultdict(list)
    for e in events:
        by_user[e["user_id"]].append(e)
    n_sessions = n_view = n_vc = n_full = 0
    for evs in by_user.values():
        evs.sort(key=lambda e: (e["ts"], e["event_id"]))
        sessions = []
        cur = []
        for e in evs:
            if cur and (e["ts"] - cur[-1]["ts"]).total_seconds() > 1800:
                sessions.append(cur)
                cur = []
            cur.append(e)
        if cur:
            sessions.append(cur)
        for s in sessions:
            n_sessions += 1
            t = {}
            for e in s:
                k = e["event_type"]
                if k in ("view", "click", "purchase") and k not in t:
                    t[k] = e["ts"]
            if "view" in t:
                n_view += 1
                if "click" in t and t["click"] > t["view"]:
                    n_vc += 1
                    if "purchase" in t and t["purchase"] > t["click"]:
                        n_full += 1
    assert row["n_sessions"] == n_sessions
    assert row["n_view"] == n_view
    assert row["n_view_click"] == n_vc
    assert row["n_full_funnel"] == n_full
    assert abs(row["session_conversion"] - round(n_full / n_view, 6)) < 1e-9
    # funnel is monotone
    assert n_view >= n_vc >= n_full

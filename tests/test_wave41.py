"""Wave-41 semantics: session trigram paths, log2 histogram."""

from __future__ import annotations

from collections import Counter

import biosets_spark.queries.wave41  # noqa: F401  (registers the wave)
from biosets_spark.queries import QUERIES
from tests.conftest import SF_SMOKE


def test_session_paths_match_bruteforce(spark):
    rows = QUERIES["q_session_paths"].fn(spark, SF_SMOKE).collect()
    ev = sorted(
        spark.read.parquet(f"{SF_SMOKE}/events.parquet").collect(),
        key=lambda e: (e["user_id"], e["ts"], e["event_id"]),
    )
    # brute-force sessionize (30-min gap) + trigram counting
    paths = Counter()
    prev_user, prev_ts, session = None, None, []
    sessions = []
    for e in ev:
        if (
            prev_user != e["user_id"]
            or (e["ts"] - prev_ts).total_seconds() > 1800
        ):
            if session:
                sessions.append(session)
            session = []
        session.append(e["event_type"])
        prev_user, prev_ts = e["user_id"], e["ts"]
    if session:
        sessions.append(session)
    for s in sessions:
        for i in range(len(s) - 2):
            paths[f"{s[i]}>{s[i + 1]}>{s[i + 2]}"] += 1
    expect = sorted(paths.items(), key=lambda kv: (-kv[1], kv[0]))[:20]
    assert [(r["path"], r["n"]) for r in rows] == expect
    # no path crosses a session boundary: total trigrams reconcile
    assert sum(paths.values()) == sum(max(len(s) - 2, 0) for s in sessions)


def test_log2_histogram_exact_binning(spark):
    rows = QUERIES["q_log2_histogram"].fn(spark, SF_SMOKE).collect()
    orders = spark.read.parquet(f"{SF_SMOKE}/orders.parquet").collect()
    cents = [round(o["o_totalprice"] * 100) for o in orders]
    bins = Counter(c.bit_length() - 1 for c in cents)
    assert {r["bin"]: r["n_orders"] for r in rows} == dict(bins)
    assert sum(r["n_orders"] for r in rows) == len(cents)
    for r in rows:
        # every member of bin b satisfies 2^b <= c < 2^(b+1) — the
        # exact power-of-two property the binary-length trick gives
        assert 2 ** r["bin"] <= r["min_cents"]
        assert r["max_cents"] < 2 ** (r["bin"] + 1)
        assert r["total_cents"] == sum(
            c for c in cents if c.bit_length() - 1 == r["bin"])

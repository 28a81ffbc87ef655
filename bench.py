"""Benchmark harness: runs the full query inventory at
$SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1) on
local[$SPARK_GRAFT_CPUS] and prints ONE JSON line:

  {"metric": "total_query_seconds", "value": N, "unit": "sec",
   "queries": {name: sec, ...}, "sf": 0.1, "anchors_warm": {...}}

Each query is timed to full materialization (collect of the final —
small — result). Session startup is excluded; a warm-up query primes
the JVM/codegen caches first.

The artifact additionally carries a WARM-ANCHOR block for the six
BASELINE.md anchor queries: each runs 3x (the inventory pass counts
as rep 1), and the block records all reps, the median of the warm
reps, and the ratio vs the round-1 baseline, with a memory-bandwidth
stamp per anchor. Rationale (r9 postmortem): single cold reps on a
bandwidth-starved host measured the neighbor, not the engine — the
warm-anchor block makes the 2x-of-baseline gate adjudicable from the
committed artifact alone even through host noise. `--anchors-warm`
runs ONLY that block (fast iteration / spot re-measurement).
"""

from __future__ import annotations

import json
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent))

# Import the driver contract module: its import block registers EVERY
# query wave, so bench coverage cannot drift from the contract surface
# (r3 missed waves 7-9 by importing waves individually here).
import __spark_entry__  # noqa: E402,F401

from biosets_spark import queries as _q  # noqa: E402
from biosets_spark.session import get_spark  # noqa: E402

# the headline set: every registered query (oracle-checked + rows-only)
SKIP: set[str] = set()

# BASELINE.md round-1 anchors (sf0.1 sec/query): the six queries the
# 2x gate is adjudicated against. Values are the measured r1 walls
# from the BASELINE.md table; _check_anchor_baselines() re-parses that
# table at startup so a re-baseline cannot silently diverge from the
# literals the committed artifacts' ratios are computed against.
ANCHORS: dict[str, float] = {
    "q_pricing_summary": 1.7,
    "q_join_agg": 1.7,
    "q_top_orders": 1.2,
    "q_dedup_minhash_lsh": 2.1,
    "q_knn_pairs": 2.6,
    "q_events_sessions": 0.7,
}


def _check_anchor_baselines() -> None:
    """Cross-check ANCHORS against the BASELINE.md table (| q_name ...
    | sf | wall | notes |). Raises on any drift so a re-baselined
    BASELINE.md forces this dict to be updated in the same commit."""
    import re as _re
    from pathlib import Path as _Path

    md = _Path(__file__).with_name("BASELINE.md")
    if not md.exists():
        return
    table: dict[str, float] = {}
    for m in _re.finditer(
        r"^\|\s*(q_\w+)[^|]*\|\s*[\d.]+\s*\|\s*([\d.]+)\s*\|",
        md.read_text(), _re.MULTILINE,
    ):
        table[m.group(1)] = float(m.group(2))
    drift = {
        n: (v, table[n]) for n, v in ANCHORS.items()
        if n in table and abs(table[n] - v) > 1e-9
    }
    missing = [n for n in ANCHORS if n not in table]
    if drift or missing:
        raise RuntimeError(
            f"ANCHORS out of sync with BASELINE.md: drift={drift} "
            f"missing={missing} — update the ANCHORS dict to match")


def parse_sf(sf_dir: str) -> float | None:
    """Tolerant scale-factor label: the old
    float(basename.replace('sf','')) crashed on any dir not named
    exactly 'sf<number>' (e.g. 'mydata', 'tpch-sf10'); the label is
    informational, never fatal."""
    import re

    m = re.search(r"sf(\d+(?:\.\d+)?)", os.path.basename(sf_dir.rstrip("/")))
    return float(m.group(1)) if m else None


def mem_bandwidth_gbps() -> float | None:
    """Single-thread STREAM-triad canary (~0.5 s): walls measured in a
    memory-bandwidth-starved host window (r9 diagnosis: 0.1-0.8 GB/s
    vs a healthy node's 50-200) measure the neighbor, not the engine —
    stamping the bandwidth into the artifact lets any reader qualify
    the run. None if numpy is unavailable."""
    try:
        import numpy as np

        n = 50_000_000
        a = np.ones(n)
        b = np.ones(n)
        tmp = np.empty(n)
        out = np.empty(n)
        # warm-up pass touches every page of tmp/out so the timed
        # region has no first-touch page faults and no fresh
        # temporaries — the old unfused `a + 2.0*b` moved ~5 arrays
        # while crediting 3, systematically understating GB/s
        np.multiply(b, 2.0, out=tmp)
        np.add(a, tmp, out=out)
        t0 = time.time()
        np.multiply(b, 2.0, out=tmp)
        np.add(a, tmp, out=out)
        # 5 streams of n*8: read b + write tmp, read a + read tmp +
        # write out (write-allocate ignored) — an order-of-magnitude
        # indicator, not lab-grade STREAM
        return round((5 * n * 8) / (time.time() - t0) / 1e9, 2)
    except Exception:
        return None


def run_anchors_warm(
    spark, sf_dir: str, first_rep: dict[str, float] | None = None
) -> dict[str, dict]:
    """Run each BASELINE.md anchor to 3 total reps and report the
    median of the WARM reps (2-3) plus the ratio vs baseline.

    `first_rep` supplies rep 1 when the inventory pass already ran the
    anchors (the default full-bench path); standalone `--anchors-warm`
    measures all 3 reps itself. Per-anchor bandwidth stamps let a
    reader discard reps taken in a starved host window."""
    block: dict[str, dict] = {}
    for name, baseline in ANCHORS.items():
        query = _q.QUERIES[name]
        reps: list[float] = []
        if first_rep and name in first_rep and first_rep[name] >= 0:
            reps.append(first_rep[name])
        bw = mem_bandwidth_gbps()
        failed = False
        while len(reps) < 3:
            t0 = time.time()
            try:
                query.fn(spark, sf_dir).collect()
            except Exception as e:  # a broken anchor must not lose the
                print(f"# ERROR anchor {name}: {type(e).__name__}: {e}",
                      file=sys.stderr)  # whole artifact
                failed = True
                break
            reps.append(round(time.time() - t0, 3))
        if failed or not reps:
            block[name] = {"reps": reps, "error": True,
                           "baseline_sec": baseline, "bw_gbps": bw}
            continue
        warm_reps = sorted(reps[1:])
        # median of the warm reps (mean of the middle two when even)
        mid = len(warm_reps) // 2
        warm = (
            warm_reps[mid]
            if len(warm_reps) % 2
            else round((warm_reps[mid - 1] + warm_reps[mid]) / 2, 3)
        )
        block[name] = {
            "reps": reps,
            "warm_sec": warm,
            "baseline_sec": baseline,
            "ratio": round(warm / baseline, 2),
            "bw_gbps": bw,
        }
    return block


def main() -> None:
    _check_anchor_baselines()
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    anchors_only = "--anchors-warm" in sys.argv[1:]
    sf = parse_sf(sf_dir)
    bw_pre = mem_bandwidth_gbps()
    spark = get_spark("biosets-spark-bench")

    # warm-up: JVM, codegen, parquet footer caches, and the Python
    # worker pool (so the first Arrow-batched query isn't charged the
    # one-time worker startup)
    spark.read.parquet(os.path.join(sf_dir, "lineitem.parquet")).count()
    spark.range(0, 1024, 1, 32).mapInPandas(lambda it: it, "id long").count()

    if anchors_only:
        payload = {
            "metric": "anchors_warm_only",
            "sf": sf,
            "bw_gbps_pre": bw_pre,
            "anchors_warm": run_anchors_warm(spark, sf_dir),
            "bw_gbps_post": mem_bandwidth_gbps(),
        }
        line = json.dumps(payload)
        print(line)
        return

    timings: dict[str, float] = {}
    for name, query in _q.QUERIES.items():
        if name in SKIP:
            continue
        t0 = time.time()
        try:
            query.fn(spark, sf_dir).collect()
            timings[name] = round(time.time() - t0, 3)
        except Exception as e:  # record failures as negative sentinel
            print(f"# ERROR {name}: {type(e).__name__}: {e}", file=sys.stderr)
            timings[name] = -1.0
    total = round(sum(t for t in timings.values() if t >= 0), 3)
    failed = sorted(n for n, t in timings.items() if t < 0)
    payload = {
        "metric": "total_query_seconds",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "sf": sf,
        "bw_gbps_pre": bw_pre,
        "anchors_warm": run_anchors_warm(spark, sf_dir, first_rep=timings),
        "bw_gbps_post": mem_bandwidth_gbps(),
    }
    if failed:
        # a crashing query SHRINKS the headline total (its runtime
        # drops out), which would read as a speedup — surface failures
        # at the top level so round-over-round comparisons see them
        payload["failed"] = failed
    line = json.dumps(payload)
    print(line)
    # Also persist to a file: the driver captures stdout by tail, which
    # truncated the r2 artifact (BENCH_r02.json parsed:null). The file
    # copy survives any tail window.
    (Path(__file__).resolve().parent / "bench_out.json").write_text(line + "\n")


if __name__ == "__main__":
    main()

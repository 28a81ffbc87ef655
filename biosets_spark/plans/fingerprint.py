"""Plan-fingerprint cache: cross-session materialized-result reuse.

The one optimizer feature the reference has that Catalyst does not
(SURVEY §4): a persistent cache keyed by a deterministic hash of the
computation (reference: src/biosets/utils/fingerprint.py:56-93 xxhash
over dill-serialized transform args; cache file reuse in
arrow_dataset.py).

Spark re-expression: fingerprint = sha256 over (canonicalized logical
plan string + input file listing (path, size, mtime) + params). A hit
short-circuits the whole computation with a Parquet scan of the cached
result; a miss computes, writes Parquet, then returns the scan of what
was written (so downstream reuse is also IO-pruned).

Driver-side library, not a Catalyst rule — mirrors the reference's
position of caching outside the execution engine.
"""

from __future__ import annotations

import hashlib
import json
import os
import re

from pyspark.sql import DataFrame, SparkSession


def _input_files_snapshot(df: DataFrame) -> list[tuple[str, int, int]]:
    out = []
    try:
        for f in df.inputFiles():
            p = f.replace("file:", "")
            try:
                st = os.stat(p)
                out.append((f, st.st_size, int(st.st_mtime)))
            except OSError:
                out.append((f, -1, -1))
    except Exception:
        pass
    return sorted(out)


_EPHEMERAL = re.compile(r"#\d+L?|plan_id=\d+")


def plan_fingerprint(df: DataFrame, params: dict | None = None) -> str:
    """Deterministic fingerprint of a DataFrame's computation.

    Canonicalization strips per-session expression ids (#123) from the
    analyzed plan string so the same logical computation fingerprints
    identically across sessions — the analogue of the reference's
    comment-insensitive function hashing
    (packaged_modules/__init__.py:29-69).
    """
    plan = df._jdf.queryExecution().analyzed().toString()
    canon = _EPHEMERAL.sub("#", plan)
    payload = json.dumps(
        {"plan": canon, "inputs": _input_files_snapshot(df), "params": params or {}},
        sort_keys=True,
    )
    return hashlib.sha256(payload.encode()).hexdigest()[:16]


class FingerprintCache:
    def __init__(self, cache_dir: str):
        self.cache_dir = cache_dir
        os.makedirs(cache_dir, exist_ok=True)

    def path_for(self, fp: str) -> str:
        return os.path.join(self.cache_dir, f"cache-{fp}.parquet")

    def has(self, fp: str) -> bool:
        p = self.path_for(fp)
        return os.path.isdir(p) and os.path.exists(os.path.join(p, "_SUCCESS"))

    def materialize(self, df: DataFrame, params: dict | None = None) -> DataFrame:
        """Return a cached-or-computed materialization of ``df``."""
        spark: SparkSession = df.sparkSession
        fp = plan_fingerprint(df, params)
        p = self.path_for(fp)
        if not self.has(fp):
            df.write.mode("overwrite").parquet(p)
        return spark.read.parquet(p)

    def clear(self) -> int:
        """Cache cleanup (reference arrow_dataset.py:255-292
        cleanup_cache_files analogue)."""
        import shutil

        n = 0
        for d in os.listdir(self.cache_dir):
            if d.startswith("cache-"):
                shutil.rmtree(os.path.join(self.cache_dir, d), ignore_errors=True)
                n += 1
        return n

"""Path planning: metadata-file discovery and split inference.

Pure driver-side planning code (no executor involvement), mirroring the
reference's glob conventions:
- sample/feature metadata discovery: ``**/sample_metadata.csv``,
  ``**/feature_metadata.*``, keyword-in-filename matching
  (data_files.py:15-67,106-190,193-230)
- split inference from filename prefixes ``train-*`` / ``test-*`` /
  ``validation-*`` (data_files.py:144-166, tests/test_load.py:241-305)
"""

from __future__ import annotations

import glob
import os
import re

from .archives import ARCHIVE_EXTS

SAMPLE_METADATA_PATTERNS = [
    r"sample[_\-\s]*metadata",
    r"sample[_\-\s]*info",
    r"sample[_\-\s]*data",
]
FEATURE_METADATA_PATTERNS = [
    r"feature[_\-\s]*metadata",
    r"feature[_\-\s]*info",
    r"annotation",
]
SPLIT_PREFIXES = ("train", "test", "validation", "val", "dev")

DATA_EXTS = {
    ".csv", ".tsv", ".txt", ".json", ".jsonl", ".ndjson", ".parquet", ".pq",
    ".arrow", ".feather", ".ipc", ".npz", ".avro", ".orc",
}
COMPRESSED_EXTS = {".gz", ".bz2", ".zst", ".zstd", ".lz4"}
# single source of truth for container formats lives in archives.py
ARCHIVE_SUFFIXES = ARCHIVE_EXTS


def _is_data_file(path: str) -> bool:
    low = path.lower()
    if low.endswith(ARCHIVE_SUFFIXES):
        return True
    base, ext = os.path.splitext(low)
    if ext in COMPRESSED_EXTS:
        ext = os.path.splitext(base)[1]
    return ext in DATA_EXTS


def _matches(name: str, patterns: list[str]) -> bool:
    base = os.path.basename(name).lower()
    return any(re.search(p, base) for p in patterns)


def _is_remote_uri(path: str) -> bool:
    """True for scheme-qualified URIs (file://, s3a://, hdfs://, ...)."""
    return bool(re.match(r"^[a-zA-Z][a-zA-Z0-9+.\-]*://", path))


def _hadoop_list_files(spark, path: str) -> tuple[bool, list[str]]:
    """Recursively list files under a URI via the JVM Hadoop FileSystem
    — the same resolver ``spark.read`` uses, so any filesystem Spark
    can scan (s3a/hdfs/abfs/gs/file) works here too. Driver-side
    planning only; no data moves. Returns (path_is_single_file,
    files). Reference parity: fsspec lazy open in streaming.py:17-60 /
    URL loads in docs/DATA_LOADING.md:117-135.
    """
    jvm = spark._jvm
    jpath = jvm.org.apache.hadoop.fs.Path(path)
    fs = jpath.getFileSystem(spark.sparkContext._jsc.hadoopConfiguration())
    status = fs.getFileStatus(jpath)
    if status.isFile():
        return True, [status.getPath().toString()]
    out = []
    it = fs.listFiles(jpath, True)
    while it.hasNext():
        out.append(it.next().getPath().toString())
    return False, sorted(out)


def discover(path: str, spark=None) -> dict:
    """Resolve a directory into {data_files, sample_metadata_files,
    feature_metadata_files} per the reference's conventions; metadata
    files are subtracted from the data file list (biodata.py:230-287).

    Scheme-qualified URIs (``s3a://bucket/prefix``, ``hdfs://...``,
    ``file:///...``) are listed through the Hadoop FileSystem (needs a
    SparkSession — pass ``spark`` or have an active one); plain local
    paths go through ``glob``.
    """
    if _is_remote_uri(path):
        if spark is None:
            from pyspark.sql import SparkSession

            spark = SparkSession.getActiveSession()
            if spark is None:
                raise ValueError(
                    f"discover({path!r}): listing a URI requires a SparkSession"
                )
        is_file, listed = _hadoop_list_files(spark, path)
        if is_file:
            return {"data_files": listed, "sample_metadata_files": [], "feature_metadata_files": []}
        all_files = [f for f in listed if _is_data_file(f)]
    else:
        if os.path.isfile(path):
            return {"data_files": [path], "sample_metadata_files": [], "feature_metadata_files": []}
        all_files = sorted(
            f for f in glob.glob(os.path.join(path, "**", "*"), recursive=True)
            if os.path.isfile(f) and _is_data_file(f)
        )
    sample_meta = [f for f in all_files if _matches(f, SAMPLE_METADATA_PATTERNS)]
    feature_meta = [f for f in all_files if _matches(f, FEATURE_METADATA_PATTERNS)]
    data = [f for f in all_files if f not in set(sample_meta) | set(feature_meta)]
    return {
        "data_files": data,
        "sample_metadata_files": sample_meta,
        "feature_metadata_files": feature_meta,
    }


def infer_splits(files: list[str]) -> dict[str, list[str]]:
    """S11: group files into named splits by filename prefix; files with
    no recognizable prefix land in 'train' (the reference's default
    split)."""
    splits: dict[str, list[str]] = {}
    for f in files:
        base = os.path.basename(f).lower()
        name = "train"
        for p in SPLIT_PREFIXES:
            if base.startswith(p + "-") or base.startswith(p + "_") or base.startswith(p + "."):
                name = {"val": "validation", "dev": "validation"}.get(p, p)
                break
        splits.setdefault(name, []).append(f)
    return splits


def parse_split_spec(
    spec: str,
) -> list[tuple[str, int | None, int | None, bool, str]]:
    """Parse 'train', 'train+test', 'train[10:20]', 'train[:10%]',
    'train[-80%:]', 'train[50%:52%](pct1_dropremainder)' into
    (split, start, stop, is_percent, rounding) parts
    (docs/DATA_LOADING.md:251-309). ``rounding`` is 'closest' unless a
    '(pct1_dropremainder)' suffix names the equal-1%%-unit mode."""
    parts = []
    for piece in spec.split("+"):
        m = re.fullmatch(
            r"(\w+)(?:\[(-?\d*)(%?):(-?\d*)(%?)\](?:\((\w+)\))?)?", piece.strip())
        if not m:
            raise ValueError(f"Bad split spec {piece!r}")
        name, a, ap, b, bp, rounding = m.groups()
        rounding = rounding or "closest"
        if rounding not in ("closest", "pct1_dropremainder"):
            raise ValueError(f"Bad rounding {rounding!r} in split spec {piece!r}")
        if a is None and b is None:
            parts.append((name, None, None, False, rounding))
        else:
            # mixed units are a user error, not "all percent": treating
            # 'train[5:50%]' as 5%..50% silently returns the wrong rows
            if a and b and bool(ap) != bool(bp):
                raise ValueError(
                    f"Mixed absolute/percent bounds in split spec {piece!r}; "
                    "use 'train[5:500]' or 'train[5%:50%]'"
                )
            pct = bool(ap or bp)
            parts.append(
                (name, int(a) if a else None, int(b) if b else None, pct, rounding))
    return parts

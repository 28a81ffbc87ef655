"""S9: compressed / archived input handling.

Reference semantics (biodata.py:1607-1616, tests/fixtures/files.py:
45-96): .zip/.tar/gz/bz2/zstd inputs are transparently extracted
before building.

Spark mapping: gz/bz2/zstd/lz4 text files are read natively by Spark's
codecs (no code needed — ``spark.read.csv("x.csv.gz")`` just works,
albeit as a single non-splittable partition per file). Container
formats (.zip/.tar/.tar.gz/.7z) have no Hadoop codec; they go through
a driver-side ingest-unpack step into a scratch directory, after which
the normal extension-dispatch readers take over. At 100 TB the
recommendation stands: unpack once at ingest, store Parquet.
"""

from __future__ import annotations

import os
import re
import tarfile
import tempfile
import urllib.parse
import zipfile

ARCHIVE_EXTS = (
    ".zip", ".tar", ".tar.gz", ".tgz", ".tar.bz2",
    ".tar.xz", ".txz", ".tar.zst", ".tzst", ".7z",
)
_TARFILE_EXTS = (".tar", ".tar.gz", ".tgz", ".tar.bz2", ".tar.xz", ".txz")


def is_archive(path: str) -> bool:
    low = path.lower()
    return low.endswith(ARCHIVE_EXTS)


def _to_local(path: str) -> str:
    """Resolve a path for the stdlib archive openers. ``file:`` URIs
    (as returned by Hadoop-FS discovery, e.g. ``file:/dir/x.zip``) are
    stripped to a plain local path; other schemes (s3a/hdfs/...) can't
    be opened driver-side — archives on remote stores must be unpacked
    at ingest (the 100 TB recommendation above applies doubly there).
    """
    # scheme must be followed by '/' — a bare colon in a filename
    # ('data:v2.zip', 'C:\\x.zip') is NOT a URI
    m = re.match(r"^([a-zA-Z][a-zA-Z0-9+.\-]*):(?=/)(?://)?(.*)$", path)
    if not m:
        return path
    scheme, _rest = m.groups()
    if scheme.lower() != "file":
        raise ValueError(
            f"cannot extract archive {path!r} from a remote filesystem; "
            "unpack it at ingest (or download it locally) first"
        )
    # file:///dir/x, file:/dir/x, file://host/dir/x all → /dir/x.
    # No percent-unquoting: Hadoop Path.toString() does not encode, and
    # unquoting would corrupt filenames containing literal '%'.
    parsed = urllib.parse.urlparse(path)
    return parsed.path


def extract(path: str, dest: str | None = None) -> list[str]:
    """Unpack a zip/tar archive; returns the extracted member paths."""
    dest = dest or tempfile.mkdtemp(prefix="biosets_unpack_")
    path = _to_local(path)
    low = path.lower()
    out: list[str] = []
    if low.endswith(".zip"):
        with zipfile.ZipFile(path) as z:
            for m in z.namelist():
                if m.endswith("/"):
                    continue
                z.extract(m, dest)
                out.append(os.path.join(dest, m))
    elif low.endswith(_TARFILE_EXTS):
        # gz/bz2/xz all via the stdlib (mode "r:*" auto-detects)
        with tarfile.open(path, "r:*") as t:
            t.extractall(dest, filter="data")
            out = [os.path.join(dest, m.name) for m in t.getmembers() if m.isfile()]
    elif low.endswith((".tar.zst", ".tzst")):
        # reference fixtures include zstd-tar (files.py:45-96); the
        # stdlib has no zstd codec, so gate behind the zstandard package
        try:
            import zstandard
        except ImportError as e:
            raise ImportError(
                f"extracting {path!r} requires the 'zstandard' package "
                "(pip install zstandard)"
            ) from e
        with open(path, "rb") as src, tempfile.NamedTemporaryFile(suffix=".tar", delete=False) as tmp:
            zstandard.ZstdDecompressor().copy_stream(src, tmp)
            tmp_tar = tmp.name
        try:
            with tarfile.open(tmp_tar, "r:") as t:
                t.extractall(dest, filter="data")
                out = [os.path.join(dest, m.name) for m in t.getmembers() if m.isfile()]
        finally:
            os.unlink(tmp_tar)
    elif low.endswith(".7z"):
        try:
            import py7zr
        except ImportError as e:
            raise ImportError(
                f"extracting {path!r} requires the 'py7zr' package (pip install py7zr)"
            ) from e
        with py7zr.SevenZipFile(path) as z:
            z.extractall(dest)
        for root, _dirs, names in os.walk(dest):
            out.extend(os.path.join(root, n) for n in names)
    else:
        raise ValueError(f"not a recognized archive: {path!r}")
    return sorted(out)


def _decompress_single(path: str) -> str:
    """Decompress a LONE .xz/.zst file to scratch (original basename
    minus the codec suffix, so extension dispatch still works). Spark
    has no Hadoop XZ codec — reading a .json.xz 'natively' silently
    produces null rows (r8 review), the silent-ignore failure class.
    zstd is gated behind the optional zstandard package."""
    import lzma

    local = _to_local(path)
    low = local.lower()
    dest = tempfile.mkdtemp(prefix="biosets_decomp_")
    if low.endswith(".xz"):
        opener = lzma.open(local, "rb")
        base = os.path.basename(local)[: -len(".xz")]
    else:  # .zst / .zstd
        try:
            import zstandard
        except ImportError as e:
            raise ImportError(
                f"reading {path!r} requires the 'zstandard' package "
                "(pip install zstandard)"
            ) from e
        opener = zstandard.open(local, "rb")
        base = os.path.basename(local)
        base = base[: -len(".zstd")] if low.endswith(".zstd") \
            else base[: -len(".zst")]
    out = os.path.join(dest, base)
    with opener as src, open(out, "wb") as dst:
        while True:
            chunk = src.read(1 << 20)
            if not chunk:
                break
            dst.write(chunk)
    return out


_SINGLE_DECOMP_EXTS = (".xz", ".zst", ".zstd")


def expand_paths(paths: list[str]) -> list[str]:
    """Replace archive entries in a file list with their extracted
    members, and decompress lone .xz/.zst single files driver-side
    (Spark has no Hadoop codec for either — a 'native' read returns
    nulls, not an error). Pass-through for everything else, including
    gz/bz2 single files which Spark reads natively.

    An archive that cannot be extracted (missing optional codec
    package, remote scheme) is skipped with a warning rather than
    failing the whole load — a stray .7z in a data directory must not
    make its CSVs unreadable. If NOTHING remains readable the first
    error is re-raised, so an explicitly requested archive still fails
    loudly."""
    import warnings

    out: list[str] = []
    errors: list[Exception] = []
    for p in paths:
        if not is_archive(p) and p.lower().endswith(_SINGLE_DECOMP_EXTS):
            try:
                out.append(_decompress_single(p))
            except ImportError as e:
                # .zst without the zstandard package: pass through
                # unchanged — a cluster whose Hadoop ships the native
                # zstd codec can still read it; forcing a skip here
                # would regress that. (.xz never lands here: stdlib
                # lzma always imports.)
                warnings.warn(
                    f"{p!r}: zstandard package absent, passing through "
                    f"to Spark's native codec (if the cluster lacks it "
                    f"the read will fail or produce garbage): {e}")
                out.append(p)
            except (ValueError, OSError) as e:
                errors.append(e)
                warnings.warn(f"skipping unreadable compressed file {p!r}: {e}")
            continue
        if is_archive(p):
            try:
                # keep only data files: a README.md / LICENSE inside an
                # archive would either fail detect_format or — worse —
                # parse as TSV prose and union into the dataset
                from .discovery import _is_data_file

                members = extract(p)
                data = [m for m in members if _is_data_file(m)]
                skipped = len(members) - len(data)
                if skipped:
                    warnings.warn(
                        f"{p!r}: ignoring {skipped} non-data member(s)")
                out.extend(data)
            # ImportError: missing optional codec; ValueError: unknown
            # scheme/format; tarfile.ReadError / zipfile.BadZipFile /
            # OSError: corrupt or unreadable archive bytes — all are
            # per-file skips, matching the docstring contract.
            except (ImportError, ValueError, tarfile.ReadError,
                    zipfile.BadZipFile, OSError) as e:
                errors.append(e)
                warnings.warn(f"skipping unreadable archive {p!r}: {e}")
        else:
            out.append(p)
    if not out and errors:
        raise errors[0]
    return out

"""Pure-Python Avro Object Container File codec — the dependency-free
fallback behind the S-series Avro source (readers.py avro dispatch).

The reference ingests Avro through its generic builder surface; Spark's
first-class path is the `spark-avro` JVM datasource, which is a
SEPARATE artifact not always present on a cluster (and absent from
this container). Rather than gating the format behind an install, this
module implements the public Avro 1.x *object container file* spec
(magic `Obj\\x01`, metadata map with `avro.schema`/`avro.codec`, sync
markers, length-prefixed blocks) and the binary encoding for the
standard type set — in ~300 lines of stdlib-only Python.

Scale design (100 TB): `read_avro_py` distributes with
`spark.read.format("binaryFile")` + `mapInPandas` for many-small-file
layouts (Kafka-archive dumps, event logs), and DELEGATES to
`read_avro_ranged` when any file is large: that path carves files
into byte ranges and splits on sync markers exactly like the JVM
datasource (Hadoop split contract, boundary-partition tested), so a
single multi-GB container parallelizes across the cluster too. The
JVM datasource is still preferred whenever its artifact is on the
cluster — readers.py tries it FIRST and falls back to this module. Decoding is Python-side
(the slow path, honestly: this is a fallback, not the hot path), but
output is Arrow-batched via mapInPandas, and the driver only ever
reads one file HEADER (schema negotiation), never data rows.

Supported: null, boolean, int, long, float, double, bytes, string,
record, enum, array, map, fixed, unions of [null, T] (any order), and
the common logical types (date, timestamp-millis/micros, decimal on
bytes/fixed). Codecs: `null`, `deflate` (raw zlib), `bzip2` and `xz`
(both stdlib) are always available; `snappy` (with the spec's CRC32
suffix) and `zstandard` are import-gated on their libraries and raise
with an actionable message when absent. General unions
of multiple non-null branches are rejected up front (restructure as a
struct of nullables — same guidance as the engine's list-join-key
rejection).
"""

from __future__ import annotations

import io
import json
import os
import struct
import zlib

MAGIC = b"Obj\x01"

# ---------------------------------------------------------------- decode

_STRUCT_FLOAT = struct.Struct("<f")
_STRUCT_DOUBLE = struct.Struct("<d")


class _Cursor:
    __slots__ = ("buf", "pos")

    def __init__(self, buf: bytes, pos: int = 0):
        self.buf = buf
        self.pos = pos

    def read(self, n: int) -> bytes:
        b = self.buf[self.pos:self.pos + n]
        if len(b) != n:
            raise EOFError("truncated avro data")
        self.pos += n
        return b

    def read_long(self) -> int:
        """Zigzag varint (spec: int and long share this encoding)."""
        buf, pos = self.buf, self.pos
        try:
            b = buf[pos]
            n = b & 0x7F
            shift = 7
            while b & 0x80:
                pos += 1
                b = buf[pos]
                n |= (b & 0x7F) << shift
                shift += 7
        except IndexError:
            raise EOFError("truncated avro data") from None
        self.pos = pos + 1
        return (n >> 1) ^ -(n & 1)

    def read_bytes(self) -> bytes:
        return self.read(self.read_long())


def _named(schema):
    """Normalize a schema node to (type_name, node_dict)."""
    if isinstance(schema, str):
        return schema, {"type": schema}
    if isinstance(schema, list):
        return "union", {"type": "union", "branches": schema}
    return schema["type"], schema


def _decoder(schema, names=None):
    """Compile a schema node into a closure `cursor -> python value`.

    Compiling once per schema (instead of dispatching per value) keeps
    the per-record cost to closure calls only; `names` resolves
    references to previously defined named types (recursive records).
    """
    names = names if names is not None else {}
    t, node = _named(schema)

    if t in names:  # reference to a named type
        return names[t]

    logical = node.get("logicalType")
    if t == "null":
        return lambda c: None
    if t == "boolean":
        return lambda c: c.read(1) == b"\x01"
    if t == "int":
        if logical == "date":
            import datetime

            epoch = datetime.date(1970, 1, 1)
            day = datetime.timedelta(days=1)
            return lambda c: epoch + day * c.read_long()
        return _Cursor.read_long
    if t == "long":
        if logical in ("timestamp-millis", "timestamp-micros"):
            import datetime

            unit = 1_000 if logical == "timestamp-millis" else 1_000_000
            epoch = datetime.datetime(1970, 1, 1)
            return lambda c: epoch + datetime.timedelta(
                microseconds=c.read_long() * (1_000_000 // unit)
            )
        return _Cursor.read_long
    if t == "float":
        return lambda c: _STRUCT_FLOAT.unpack(c.read(4))[0]
    if t == "double":
        return lambda c: _STRUCT_DOUBLE.unpack(c.read(8))[0]
    if t == "bytes":
        if logical == "decimal":
            from decimal import Decimal

            scale = node.get("scale", 0)
            q = Decimal(1).scaleb(-scale)
            return lambda c: (
                Decimal(int.from_bytes(c.read_bytes(), "big", signed=True))
                .scaleb(-scale).quantize(q)
            )
        return _Cursor.read_bytes
    if t == "string":
        return lambda c: c.read_bytes().decode("utf-8")
    if t == "fixed":
        size = node["size"]
        if logical == "decimal":
            from decimal import Decimal

            scale = node.get("scale", 0)
            q = Decimal(1).scaleb(-scale)
            return lambda c: (
                Decimal(int.from_bytes(c.read(size), "big", signed=True))
                .scaleb(-scale).quantize(q)
            )
        return lambda c: c.read(size)
    if t == "enum":
        symbols = node["symbols"]
        return lambda c: symbols[c.read_long()]
    if t == "record":
        # decode to dicts ({field: value}) — the shape both pandas and
        # the Arrow struct converter accept for nested records.
        # Registered before compiling fields so recursive refs resolve.
        field_fns: list = []

        def rec(c, _fns=field_fns):
            return {name: fn(c) for name, fn in _fns}

        if "name" in node:
            names[node["name"]] = rec
        field_fns.extend(
            (f["name"], _decoder(f["type"], names)) for f in node["fields"]
        )
        return rec
    if t == "array":
        item = _decoder(node["items"], names)

        def arr(c):
            out = []
            n = c.read_long()
            while n != 0:
                if n < 0:  # block with byte-size prefix
                    n = -n
                    c.read_long()
                for _ in range(n):
                    out.append(item(c))
                n = c.read_long()
            return out

        return arr
    if t == "map":
        val = _decoder(node["values"], names)

        def mp(c):
            out = {}
            n = c.read_long()
            while n != 0:
                if n < 0:
                    n = -n
                    c.read_long()
                for _ in range(n):
                    k = c.read_bytes().decode("utf-8")
                    out[k] = val(c)
                n = c.read_long()
            return out

        return mp
    if t == "union":
        branches = node["branches"]
        kinds = [_named(b)[0] for b in branches]
        non_null = [b for b in branches if _named(b)[0] != "null"]
        if len(non_null) > 1:
            raise ValueError(
                "avro_py: only [null, T] unions are supported; restructure "
                f"the {kinds} union as a record of nullables"
            )
        fns = [_decoder(b, names) for b in branches]
        return lambda c: fns[c.read_long()](c)
    raise ValueError(f"avro_py: unsupported schema node {schema!r}")


def parse_header(raw: bytes):
    """Parse a container header -> (schema_dict, codec, sync, data_pos)."""
    if raw[:4] != MAGIC:
        raise ValueError("not an Avro object container file (bad magic)")
    c = _Cursor(raw, 4)
    meta = {}
    n = c.read_long()
    while n != 0:
        if n < 0:
            n = -n
            c.read_long()
        for _ in range(n):
            k = c.read_bytes().decode("utf-8")
            meta[k] = c.read_bytes()
        n = c.read_long()
    sync = c.read(16)
    schema = json.loads(meta["avro.schema"].decode("utf-8"))
    codec = meta.get("avro.codec", b"null").decode("utf-8")
    return schema, codec, sync, c.pos


def _gated_codec_lib(codec: str):
    """Import the optional third-party codec library, or raise the
    actionable message (python-snappy / zstandard aren't stdlib and
    may be absent from a cluster's Python; bzip2/xz/deflate never hit
    this path — they are stdlib)."""
    try:
        if codec == "snappy":
            import snappy
            return snappy
        if codec == "zstandard":
            import zstandard
            return zstandard
    except ImportError as exc:
        raise ValueError(
            f"avro_py: codec {codec!r} needs its decompressor library "
            "(python-snappy / zstandard), not available here — re-encode "
            "with deflate or null, or install spark-avro on the cluster"
        ) from exc
    raise ValueError(f"avro_py: unknown avro codec {codec!r}")


def _decompress(block: bytes, codec: str) -> bytes:
    if codec == "null":
        return block
    if codec == "deflate":  # raw deflate, no zlib header (spec)
        return zlib.decompress(block, -15)
    if codec == "bzip2":  # standard bzip2 stream (spec)
        import bz2
        return bz2.decompress(block)
    if codec == "xz":  # standard xz stream (spec)
        import lzma
        return lzma.decompress(block, format=lzma.FORMAT_XZ)
    if codec == "snappy":
        # Spec: snappy-compressed bytes then a 4-byte big-endian CRC32
        # of the UNCOMPRESSED data.
        snappy = _gated_codec_lib("snappy")
        if len(block) < 4:
            raise ValueError("avro_py: snappy block shorter than its CRC32 suffix")
        data = snappy.uncompress(block[:-4])
        if zlib.crc32(data) & 0xFFFFFFFF != int.from_bytes(block[-4:], "big"):
            raise ValueError("avro_py: snappy block CRC32 mismatch (corrupt file)")
        return data
    if codec == "zstandard":
        zstandard = _gated_codec_lib("zstandard")
        # decompressobj handles frames without a content-size header
        # (the common case for streamed writers)
        return zstandard.ZstdDecompressor().decompressobj().decompress(block)
    raise ValueError(
        f"avro_py: unknown avro codec {codec!r} — this reader speaks "
        "null/deflate/bzip2/xz natively and snappy/zstandard via their "
        "libraries; re-encode or install spark-avro on the cluster"
    )


def iter_records(raw: bytes):
    """Yield decoded records (tuples for the top-level record schema)
    from one container file held in memory."""
    schema, codec, sync, pos = parse_header(raw)
    dec = _decoder(schema)
    c = _Cursor(raw, pos)
    end = len(raw)
    while c.pos < end:
        n_rec = c.read_long()
        block = _decompress(c.read_bytes(), codec)
        if c.read(16) != sync:
            raise ValueError("avro_py: sync marker mismatch (corrupt file)")
        bc = _Cursor(block)
        for _ in range(n_rec):
            yield dec(bc)


# --------------------------------------------------------- schema mapping

def spark_type(schema) -> str:
    """Avro schema node -> Spark DDL type string."""
    t, node = _named(schema)
    logical = node.get("logicalType")
    if t == "union":
        non_null = [b for b in node["branches"] if _named(b)[0] != "null"]
        if len(non_null) != 1:
            raise ValueError("avro_py: only [null, T] unions are supported")
        return spark_type(non_null[0])
    if logical == "date":
        return "date"
    if logical in ("timestamp-millis", "timestamp-micros"):
        return "timestamp"
    if logical == "decimal":
        return f"decimal({node.get('precision', 38)},{node.get('scale', 0)})"
    simple = {
        "null": "void", "boolean": "boolean", "int": "int", "long": "bigint",
        "float": "float", "double": "double", "bytes": "binary",
        "string": "string", "enum": "string", "fixed": "binary",
    }
    if t in simple:
        return simple[t]
    if t == "record":
        inner = ", ".join(
            f"`{f['name']}`: {spark_type(f['type'])}" for f in node["fields"]
        )
        return f"struct<{inner}>"
    if t == "array":
        return f"array<{spark_type(node['items'])}>"
    if t == "map":
        return f"map<string, {spark_type(node['values'])}>"
    raise ValueError(f"avro_py: unsupported schema node {schema!r}")


def record_ddl(schema) -> str:
    """Top-level record schema -> Spark DDL column list."""
    t, node = _named(schema)
    if t != "record":
        raise ValueError("avro_py: top-level schema must be a record")
    return ", ".join(
        f"`{f['name']}` {spark_type(f['type'])}" for f in node["fields"]
    )


# ---------------------------------------------------------------- encode

def _zigzag(n: int) -> bytes:
    # coerce to an arbitrary-precision python int FIRST: a numpy int64
    # (array elements skip norm()'s int() coercion) with |n| >= 2^62
    # wraps on the zigzag shift, the arithmetic >>= 7 then pins at -1,
    # and the loop below never terminates (verified hang)
    n = int(n)
    n = (n << 1) ^ (n >> 63)
    out = bytearray()
    while True:
        b = n & 0x7F
        n >>= 7
        if n:
            out.append(b | 0x80)
        else:
            out.append(b)
            return bytes(out)


def _encoder(schema, names=None):
    names = names if names is not None else {}
    t, node = _named(schema)
    if t in names:
        return names[t]
    logical = node.get("logicalType")
    if t == "null":
        return lambda v: b""
    if t == "boolean":
        return lambda v: b"\x01" if v else b"\x00"
    if t in ("int", "long"):
        # logical types encode from the decoded Python objects too, so
        # decode -> encode roundtrips (r6 review); raw ints pass through
        if logical == "date":
            import datetime

            epoch = datetime.date(1970, 1, 1)
            return lambda v: _zigzag(
                (v - epoch).days if isinstance(v, datetime.date) else v
            )
        if logical in ("timestamp-millis", "timestamp-micros"):
            import datetime

            unit = 1_000 if logical == "timestamp-millis" else 1_000_000
            epoch = datetime.datetime(1970, 1, 1)

            def enc_ts(v, _u=unit, _e=epoch):
                if isinstance(v, datetime.datetime):
                    delta = v - _e
                    micros = (
                        (delta.days * 86_400 + delta.seconds) * 1_000_000
                        + delta.microseconds
                    )
                    v = micros // (1_000_000 // _u)
                return _zigzag(v)

            return enc_ts
        return _zigzag
    if t == "float":
        return _STRUCT_FLOAT.pack
    if t == "double":
        return _STRUCT_DOUBLE.pack
    if t == "bytes":
        if logical == "decimal":
            from decimal import Decimal

            scale = node.get("scale", 0)

            def enc_dec(v, _s=scale):
                if isinstance(v, Decimal):
                    unscaled = int(v.scaleb(_s))
                    length = max(1, (unscaled.bit_length() + 8) // 8)
                    v = unscaled.to_bytes(length, "big", signed=True)
                return _zigzag(len(v)) + bytes(v)

            return enc_dec
        return lambda v: _zigzag(len(v)) + bytes(v)
    if t == "string":
        return lambda v: (lambda b: _zigzag(len(b)) + b)(v.encode("utf-8"))
    if t == "fixed":
        return bytes
    if t == "enum":
        idx = {s: i for i, s in enumerate(node["symbols"])}
        return lambda v: _zigzag(idx[v])
    if t == "record":
        field_fns: list = []
        f_names = [f["name"] for f in node["fields"]]

        def rec(v, _fns=field_fns, _fnames=f_names):
            # nested records arrive from Arrow/pandas as DICTS; encode
            # values in schema field order, never dict iteration order
            vals = [v[nm] for nm in _fnames] if isinstance(v, dict) else v
            return b"".join(fn(x) for fn, x in zip(_fns, vals))

        if "name" in node:
            names[node["name"]] = rec
        field_fns.extend(_encoder(f["type"], names) for f in node["fields"])
        return rec
    if t == "array":
        item = _encoder(node["items"], names)
        # len() (not truthiness): Arrow hands arrays to the writer as
        # numpy arrays, whose bool() raises for length > 1
        return lambda v: (
            (_zigzag(len(v)) + b"".join(item(x) for x in v))
            if len(v) else b""
        ) + _zigzag(0)
    if t == "map":
        val = _encoder(node["values"], names)
        enc_s = _encoder("string", names)
        return lambda v: (
            (_zigzag(len(v)) + b"".join(enc_s(k) + val(x) for k, x in v.items()))
            if len(v) else b""
        ) + _zigzag(0)
    if t == "union":
        branches = node["branches"]
        fns = [_encoder(b, names) for b in branches]
        null_i = next(
            (i for i, b in enumerate(branches) if _named(b)[0] == "null"), None
        )
        other_i = next(
            (i for i, b in enumerate(branches) if _named(b)[0] != "null"), None
        )
        if null_i is None or other_i is None or len(branches) != 2:
            raise ValueError("avro_py: only [null, T] unions are supported")

        def un(v):
            if v is None:
                return _zigzag(null_i)
            return _zigzag(other_i) + fns[other_i](v)

        return un
    raise ValueError(f"avro_py: unsupported schema node {schema!r}")


def write_container(
    path: str,
    schema: dict,
    rows,
    codec: str = "null",
    records_per_block: int = 4096,
    sync: bytes | None = None,
) -> int:
    """Write rows (sequences matching the record field order) to an
    Avro object container file. Test/sink helper — one file per call;
    for a distributed sink, call per partition via foreachPartition.
    Returns the number of rows written. ``sync`` defaults to a random
    16-byte marker per file (the spec's intent: block data must not be
    able to collide with the marker, which the ranged reader's scan
    relies on)."""
    if sync is None:
        sync = os.urandom(16)
    if len(sync) != 16:
        raise ValueError("avro sync marker must be 16 bytes")
    enc = _encoder(schema)
    n_total = 0
    with open(path, "wb") as f:
        f.write(MAGIC)
        meta = {
            "avro.schema": json.dumps(schema).encode("utf-8"),
            "avro.codec": codec.encode("utf-8"),
        }
        f.write(_zigzag(len(meta)))
        for k, v in meta.items():
            kb = k.encode("utf-8")
            f.write(_zigzag(len(kb)) + kb + _zigzag(len(v)) + v)
        f.write(_zigzag(0))
        f.write(sync)
        buf, n = io.BytesIO(), 0
        for row in rows:
            buf.write(enc(row))
            n += 1
            if n >= records_per_block:
                _flush_block(f, buf, n, codec, sync)
                buf, n = io.BytesIO(), 0
                n_total += records_per_block
        if n:
            _flush_block(f, buf, n, codec, sync)
            n_total += n
    return n_total


def _flush_block(f, buf, n, codec, sync):
    data = buf.getvalue()
    if codec == "deflate":
        comp = zlib.compressobj(9, zlib.DEFLATED, -15)
        data = comp.compress(data) + comp.flush()
    elif codec == "bzip2":
        import bz2
        data = bz2.compress(data)
    elif codec == "xz":
        import lzma
        data = lzma.compress(data, format=lzma.FORMAT_XZ)
    elif codec == "snappy":
        snappy = _gated_codec_lib("snappy")
        crc = zlib.crc32(data) & 0xFFFFFFFF
        data = snappy.compress(data) + crc.to_bytes(4, "big")
    elif codec == "zstandard":
        zstandard = _gated_codec_lib("zstandard")
        data = zstandard.ZstdCompressor().compress(data)
    elif codec != "null":
        raise ValueError(f"avro_py: unsupported write codec {codec!r}")
    f.write(_zigzag(n) + _zigzag(len(data)) + data + sync)


# ------------------------------------------------------------ spark read

def read_avro_py(spark, files: list[str], large_file_bytes: int = 64 << 20):
    """Distributed Avro read without the spark-avro artifact.

    Driver reads ONE header (first file, first ~1 MB) to negotiate the
    schema; executors get whole files via the binaryFile source and
    decode them Arrow-batched through mapInPandas. Per-file
    parallelism for many-small-file layouts; when any file exceeds
    ``large_file_bytes`` the read delegates to ``read_avro_ranged``,
    which splits on sync markers for intra-file parallelism (so one
    multi-GB container no longer serializes on one task).
    """
    import os as _os

    import pandas as pd  # noqa: F401 (executor-side requirement)

    plain = [p[len("file://"):] if p.startswith("file://") else p for p in files]
    if all("://" not in p for p in plain) and any(
        _os.path.exists(p) and _os.path.getsize(p) > large_file_bytes
        for p in plain
    ):
        return read_avro_ranged(spark, files)

    first = sorted(files)[0]
    local = first
    if local.startswith("file://"):
        local = local[len("file://"):]
    if "://" in local:
        raise ValueError(
            "the pure-Python Avro fallback negotiates its schema by "
            f"reading the first file's header driver-side; {first!r} is "
            "a remote URI — install the spark-avro datasource for "
            "remote storage, or stage the files locally"
        )
    with open(local, "rb") as f:
        head = f.read(1 << 20)
    schema, _codec, _sync, _pos = parse_header(head)
    ddl = record_ddl(schema)
    t, node = _named(schema)
    field_names = [f["name"] for f in node["fields"]]

    bin_df = spark.read.format("binaryFile").load(files)

    def decode(batches):
        import pandas as pd

        for batch in batches:
            for raw, path in zip(batch["content"], batch["path"]):
                raw = bytes(raw)
                # each file decodes under its OWN embedded schema; the
                # output frame is pinned to the first file's field list,
                # so drift must fail with the file named, not a
                # KeyError deep in an executor (r6 review)
                f_schema, _c, _s, _p = parse_header(raw[:1 << 20])
                _t, f_node = _named(f_schema)
                f_names = [f["name"] for f in f_node["fields"]]
                _check_schema_drift(path, f_names, field_names)
                recs = list(iter_records(raw))
                if not recs:
                    continue
                yield pd.DataFrame(
                    {n: [r[n] for r in recs] for n in field_names}
                )

    return bin_df.select("content", "path").mapInPandas(decode, schema=ddl)


# ------------------------------------------------------------ spark write

def avro_schema_of(spark_type_obj, name: str = "Row"):
    """Spark DataType -> Avro schema node (inverse of spark_type for
    the supported set). Nullable fields become [null, T] unions at the
    field level (see write_avro)."""
    from pyspark.sql import types as T

    t = spark_type_obj
    if isinstance(t, T.BooleanType):
        return "boolean"
    if isinstance(t, (T.ByteType, T.ShortType, T.IntegerType)):
        return "int"
    if isinstance(t, T.LongType):
        return "long"
    if isinstance(t, T.FloatType):
        return "float"
    if isinstance(t, T.DoubleType):
        return "double"
    if isinstance(t, T.StringType):
        return "string"
    if isinstance(t, T.BinaryType):
        return "bytes"
    if isinstance(t, T.DateType):
        return {"type": "int", "logicalType": "date"}
    if isinstance(t, (T.TimestampType, T.TimestampNTZType)):
        return {"type": "long", "logicalType": "timestamp-micros"}
    if isinstance(t, T.DecimalType):
        return {"type": "bytes", "logicalType": "decimal",
                "precision": t.precision, "scale": t.scale}
    if isinstance(t, T.ArrayType):
        item = avro_schema_of(t.elementType)
        if t.containsNull:  # Spark containers are nullable by default
            item = ["null", item]
        return {"type": "array", "items": item}
    if isinstance(t, T.MapType):
        if not isinstance(t.keyType, T.StringType):
            raise ValueError("avro maps require string keys")
        val = avro_schema_of(t.valueType)
        if t.valueContainsNull:
            val = ["null", val]
        return {"type": "map", "values": val}
    if isinstance(t, T.StructType):
        return {
            "type": "record", "name": name,
            "fields": [
                {"name": f.name,
                 "type": ["null", avro_schema_of(f.dataType, name + "_" + f.name)]
                 if f.nullable else avro_schema_of(f.dataType, name + "_" + f.name)}
                for f in t.fields
            ],
        }
    raise ValueError(f"avro_py: unsupported Spark type {t.simpleString()}")


def write_avro(df, path: str, codec: str = "deflate") -> int:
    """Distributed Avro sink without the spark-avro artifact: each
    partition writes one container file ``part-<pid>.avro`` under
    ``path`` (local/shared filesystem — the same constraint as the
    fallback reader; use spark-avro for object stores). Every column
    becomes a [null, T]-union field when nullable. Returns the number
    of partitions written. Complements read_avro_py so the codec
    round-trips end-to-end."""
    import os

    from pyspark.sql import types as T

    os.makedirs(path, exist_ok=True)
    schema = avro_schema_of(df.schema, "SparkRow")
    fields = [f["name"] for f in schema["fields"]]
    # per-field normalizers, derived from the SPARK schema: Arrow's
    # pandas conversion float-coerces nullable int columns (1 -> 1.0)
    # and uses NaT for null timestamps — undo both, and map every
    # scalar null-ish (None/NaN/NaT) to None so the [null,T] union
    # encodes the null branch (r6 review fixes #3/#4)
    int_fields = {
        f.name for f in df.schema.fields
        if isinstance(f.dataType,
                      (T.ByteType, T.ShortType, T.IntegerType, T.LongType))
    }

    def write_part(batches):
        import pandas as pd
        from pyspark import TaskContext

        def norm(name, v):
            if isinstance(v, (list, dict)) or type(v).__name__ == "ndarray":
                return list(v) if not isinstance(v, dict) else v
            if v is None or pd.isna(v):
                return None
            if name in int_fields:
                return int(v)  # undo float64 coercion of nullable ints
            if isinstance(v, bytearray):
                return bytes(v)
            return v

        pid = TaskContext.get().partitionId()
        rows = []
        for batch in batches:
            for tup in batch[fields].itertuples(index=False, name=None):
                rows.append(tuple(
                    norm(nm, v) for nm, v in zip(fields, tup)
                ))
        if rows:
            write_container(
                os.path.join(path, f"part-{pid:05d}.avro"), schema, rows,
                codec=codec,
            )
            yield pd.DataFrame({"files": [1]})

    n = (
        df.mapInPandas(write_part, schema="files int")
        .agg({"files": "sum"})
        .collect()[0][0]
    )
    return int(n or 0)


def _check_schema_drift(path, f_names, expected):
    """Shared guard for BOTH read paths: every file decodes under its
    own embedded schema, but the output frame is pinned to the first
    file's field list, so drift must fail with the file named."""
    if f_names != expected:
        raise ValueError(
            f"avro schema drift: {path} has fields {f_names}, expected "
            f"{expected} (from the first file) — read drifted files "
            "separately and align with the engine's schema lattice"
        )


# ---------------------------------------------------- ranged (split) read

def _iter_block_records(f, schema, codec, sync, end: int):
    """Yield records from container blocks OWNED by a range ending at
    ``end``; assumes ``f`` is positioned at a block start (just past a
    sync marker). Ownership follows the Avro/Hadoop split contract: a
    block belongs to the range containing the FIRST BYTE of its
    preceding sync marker — so a sync spanning a range boundary is
    owned by the earlier range (whose scan read it in full), adjacent
    ranges partition the block set exactly, and no block is read twice
    or lost."""
    dec = _decoder(schema)
    while True:
        block_start = f.tell()
        if block_start - 16 >= end:  # preceding sync starts past range
            return
        head = f.read(20)  # enough for two varints
        if not head:
            return
        c = _Cursor(head)
        try:
            n_rec = c.read_long()
            n_bytes = c.read_long()
        except EOFError:
            return
        var_len = c.pos
        in_head = head[var_len:var_len + n_bytes]
        if n_bytes <= len(in_head):
            body = in_head  # whole (small) block already in the head read
        else:
            body = in_head + f.read(n_bytes - len(in_head))
        if len(body) < n_bytes:
            return  # truncated tail
        f.seek(block_start + var_len + n_bytes)  # head may have over-read
        if f.read(16) != sync:
            raise ValueError("avro_py: sync marker mismatch (corrupt file)")
        bc = _Cursor(_decompress(body, codec))
        for _ in range(n_rec):
            yield dec(bc)


def _scan_to_sync(f, sync: bytes, limit: int) -> bool:
    """Advance ``f`` to just past the next sync marker at/after the
    current position (returns False if none before ``limit``).
    Overlapping-window search so markers spanning read chunks are
    found."""
    tail = b""
    while True:
        pos = f.tell()
        if pos - len(tail) >= limit:
            return False
        chunk = f.read(1 << 20)
        if not chunk:
            return False
        buf = tail + chunk
        i = buf.find(sync)
        if i != -1:
            sync_start = pos - len(tail) + i
            if sync_start >= limit:
                return False  # that sync belongs to the next range
            f.seek(sync_start + 16)
            return True
        tail = buf[-15:]


def read_avro_ranged(spark, files: list[str], split_bytes: int = 32 << 20):
    """Split-parallel Avro read without the spark-avro artifact: every
    file is carved into ~``split_bytes`` byte ranges; each task seeks
    to its range, scans to the next sync marker, and decodes exactly
    the blocks that START inside its range (the Hadoop split contract,
    so ranges partition the records with no overlap or loss). This
    removes the whole-file-per-task limitation of ``read_avro_py`` —
    a single multi-GB container file parallelizes across the cluster.
    Requires the files to be reachable from the executors by path
    (local/shared FS — the same constraint as the fallback reader).
    """
    import os as _os

    import pandas as pd  # noqa: F401

    paths = sorted(
        p[len("file://"):] if p.startswith("file://") else p for p in files
    )
    remote = [p for p in paths if "://" in p]
    if remote:
        raise ValueError(
            f"read_avro_ranged needs executor-reachable local paths; "
            f"{remote[0]!r} is a remote URI — install the spark-avro "
            "datasource for remote storage, or stage the files locally"
        )
    with open(paths[0], "rb") as f:
        head = f.read(1 << 20)
    schema, _codec, _sync, _pos = parse_header(head)
    ddl = record_ddl(schema)
    t, node = _named(schema)
    field_names = [f["name"] for f in node["fields"]]

    split_bytes = max(split_bytes, 1 << 20)  # never split inside a header
    ranges = []
    for p in paths:
        size = _os.path.getsize(p)
        start = 0
        while start < size:
            ranges.append((p, start, min(start + split_bytes, size)))
            start += split_bytes
    rdf = spark.createDataFrame(ranges, "path string, start long, end long")
    n_parts = min(len(ranges), 256)
    rdf = rdf.repartition(n_parts)

    def decode(batches):
        import pandas as pd

        for batch in batches:
            for path, start, end in zip(batch["path"], batch["start"], batch["end"]):
                with open(path, "rb") as f:
                    f_schema, f_codec, f_sync, data_pos = parse_header(
                        f.read(1 << 20)
                    )
                    f_names = [x["name"] for x in _named(f_schema)[1]["fields"]]
                    _check_schema_drift(path, f_names, field_names)
                    if start == 0:
                        f.seek(data_pos)  # first block follows the header
                    else:
                        f.seek(start)
                        if not _scan_to_sync(f, f_sync, end):
                            continue  # no block starts in this range
                    recs = list(
                        _iter_block_records(f, f_schema, f_codec, f_sync, end)
                    )
                if recs:
                    yield pd.DataFrame(
                        {n: [r[n] for r in recs] for n in field_names}
                    )

    return rdf.mapInPandas(decode, schema=ddl)

"""Physical-type upcast lattice and schema unification.

Re-expresses the reference's cross-shard type-promotion rules
(reference: src/biosets/utils/table_util.py:48-151 ``determine_upcast``
/ ``upcast_tables`` / permissive concat) on Spark SQL types.

The reference enumerates an Arrow lattice ``null < bool < int8 < ... <
string``; Spark lacks unsigned ints and float16, so the lattice folds
them the same way Spark's own Parquet reader does (uint8->short,
uint16->int, uint32->long, uint64->decimal(20,0), float16->float).

Everything here is driver-side planning code: the output is a target
``StructType`` plus per-DataFrame ``cast`` projections, which Catalyst
compiles into the scan (column pruning + cast codegen); no executor
custom code is involved.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

# Rank order of the numeric/widening chain. A pair of types whose common
# supertype is not expressible picks the first type that can represent
# both (string is the top element, as in the reference lattice).
_RANK = {
    T.NullType(): 0,
    T.BooleanType(): 1,
    T.ByteType(): 2,
    T.ShortType(): 3,
    T.IntegerType(): 4,
    T.LongType(): 5,
    T.FloatType(): 6,
    T.DoubleType(): 7,
}

_TEMPORAL = (T.DateType, T.TimestampType, T.TimestampNTZType)


def upcast(a: T.DataType, b: T.DataType) -> T.DataType:
    """Smallest common supertype of two Spark types.

    Mirrors the reference's ``determine_upcast`` hierarchy
    (table_util.py:91-127): numeric widening, int->decimal,
    decimal->double on overflow risk, temporal kept if equal,
    otherwise promote to string (the lattice top).
    """
    # NullType is the lattice bottom (identity). The repair of a column
    # that stays NullType -> string happens at schema materialization
    # (unify_schemas), NOT here — repairing pairwise would break
    # associativity (null ⊔ null ⊔ bool must be bool, not string).
    # Reference repair point: biodata.py:1306-1307, table_util.py:254-255.
    if isinstance(a, T.NullType):
        return b
    if isinstance(b, T.NullType):
        return a
    if a == b:
        return a

    if a in _RANK and b in _RANK:
        # int32/int64 ⊔ float32 -> float64, not float32: a float32 has
        # a 24-bit mantissa, so promoting a long/int column into it
        # silently corrupts ids/counts above 16,777,216 (numpy/Arrow
        # promote the same way). byte/short fit float32 exactly.
        pair = {a, b}
        if T.FloatType() in pair and pair & {T.IntegerType(), T.LongType()}:
            return T.DoubleType()
        return a if _RANK[a] >= _RANK[b] else b

    # decimal vs integer/decimal
    if isinstance(a, T.DecimalType) or isinstance(b, T.DecimalType):
        da, db = _as_decimal(a), _as_decimal(b)
        if da is not None and db is not None:
            scale = max(da.scale, db.scale)
            intd = max(da.precision - da.scale, db.precision - db.scale)
            if intd + scale <= 38:
                return T.DecimalType(intd + scale, scale)
            return T.DoubleType()
        if isinstance(a, T.DecimalType) and isinstance(b, (T.FloatType, T.DoubleType)):
            return T.DoubleType()
        if isinstance(b, T.DecimalType) and isinstance(a, (T.FloatType, T.DoubleType)):
            return T.DoubleType()
        return T.StringType()

    # temporal pairs: date < timestamp
    if isinstance(a, _TEMPORAL) and isinstance(b, _TEMPORAL):
        if isinstance(a, T.DateType):
            return b
        if isinstance(b, T.DateType):
            return a
        return T.TimestampType()

    # binary/string
    if isinstance(a, T.BinaryType) and isinstance(b, T.StringType):
        return T.StringType()
    if isinstance(b, T.BinaryType) and isinstance(a, T.StringType):
        return T.StringType()

    # arrays: recurse on element type
    if isinstance(a, T.ArrayType) and isinstance(b, T.ArrayType):
        return T.ArrayType(upcast(a.elementType, b.elementType), a.containsNull or b.containsNull)

    # structs: union of fields, recursive upcast on shared names
    if isinstance(a, T.StructType) and isinstance(b, T.StructType):
        fields: dict[str, T.DataType] = {}
        for f in list(a.fields) + list(b.fields):
            fields[f.name] = upcast(fields[f.name], f.dataType) if f.name in fields else f.dataType
        return T.StructType([T.StructField(n, t, True) for n, t in fields.items()])

    return T.StringType()


def _as_decimal(t: T.DataType) -> T.DecimalType | None:
    if isinstance(t, T.DecimalType):
        return t
    if isinstance(t, T.BooleanType):
        # bool sits below byte in the numeric chain, so it must also
        # absorb into decimal or the lattice loses order-independence
        return T.DecimalType(1, 0)
    if isinstance(t, T.ByteType):
        return T.DecimalType(3, 0)
    if isinstance(t, T.ShortType):
        return T.DecimalType(5, 0)
    if isinstance(t, T.IntegerType):
        return T.DecimalType(10, 0)
    if isinstance(t, T.LongType):
        return T.DecimalType(20, 0)
    return None


def unify_schemas(schemas: list[T.StructType]) -> T.StructType:
    """Common schema across shards: union of columns (first-seen order),
    per-column upcast promotion; NullType columns repair to string
    (reference: biodata.py:1306-1307, table_util.py:254-255).
    """
    order: list[str] = []
    types: dict[str, T.DataType] = {}
    meta: dict[str, dict] = {}
    for s in schemas:
        for f in s.fields:
            if f.name not in types:
                order.append(f.name)
                types[f.name] = f.dataType
                meta[f.name] = dict(f.metadata or {})
            else:
                types[f.name] = upcast(types[f.name], f.dataType)
                meta[f.name] = {**dict(f.metadata or {}), **meta[f.name]}
    out = []
    for n in order:
        t = T.StringType() if isinstance(types[n], T.NullType) else types[n]
        out.append(T.StructField(n, t, True, metadata=meta[n]))
    return T.StructType(out)


def align_to_schema(
    df: DataFrame,
    schema: T.StructType,
    zero_as_missing: bool = False,
) -> DataFrame:
    """Project/cast/fill a DataFrame to a pinned target schema.

    Reference semantics (biodata.py:1144-1176): later shards are
    column-pruned and cast to the pinned schema; columns absent from
    the shard are filled with null (or 0 when ``zero_as_missing``).
    Extra columns not in the pinned schema are dropped.
    """
    have = {f.name: f for f in df.schema.fields}
    cols = []
    for f in schema.fields:
        if f.name in have:
            src = have[f.name]
            from .roles import qcol

            c = qcol(f.name)
            if src.dataType != f.dataType:
                c = c.cast(f.dataType)
            cols.append(c.alias(f.name, metadata=dict(f.metadata or {})))
        else:
            fill = F.lit(0) if zero_as_missing and _is_numeric(f.dataType) else F.lit(None)
            cols.append(fill.cast(f.dataType).alias(f.name, metadata=dict(f.metadata or {})))
    return df.select(*cols)


def _is_numeric(t: T.DataType) -> bool:
    return isinstance(t, T.NumericType)


def union_promote(dfs: list[DataFrame], zero_as_missing: bool = False) -> DataFrame:
    """Vertical concat with schema promotion (C1/C3).

    Equivalent of ``pa.concat_tables(promote_options="permissive")``
    (reference: table_util.py:143-151): unify shard schemas through the
    upcast lattice, align each shard, then unionByName. The casts are
    emitted before the union so Catalyst folds them into each branch's
    scan — at cluster scale this stays a narrow (shuffle-free) op.
    """
    if not dfs:
        raise ValueError("union_promote: need at least one DataFrame")
    if len(dfs) == 1:
        return dfs[0]
    target = unify_schemas([d.schema for d in dfs])
    out = align_to_schema(dfs[0], target, zero_as_missing)
    for d in dfs[1:]:
        out = out.unionByName(align_to_schema(d, target, zero_as_missing))
    return out

"""Self-check harness: run every queries() entry on Spark AND its
oracle_sql() on DuckDB at a given scale factor, compare row count,
column names, and order-insensitive values — a local stand-in for the
driver's CORRECTNESS gate.

Usage: python tools/check_oracle.py [sf_dir] [query_name ...]
"""

from __future__ import annotations

import math
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import duckdb  # noqa: E402

import __spark_entry__ as entrymod  # noqa: E402
from biosets_spark.session import get_spark  # noqa: E402
from biosets_spark.tables import ALL_TABLES  # noqa: E402


def canon(v):
    if v is None:
        return None
    if isinstance(v, bool):
        return v
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return float(f"{v:.10g}")
    if isinstance(v, int):
        # Keep int-class distinct from float-class: the driver's hash is
        # type-sensitive (the r1 HUGEINT bug slipped through because this
        # used to fold ints into floats).
        return v
    # containers recurse so floats/decimals INSIDE arrays and structs
    # get the same canonicalization as scalars (a raw str() of
    # [Decimal('1.00')] vs [1.0] would false-FAIL equal values)
    if hasattr(v, "asDict"):  # pyspark Row (struct cell) — BEFORE the
        # tuple branch: Row subclasses tuple and would lose its keys
        return tuple(sorted((k, canon(x)) for k, x in v.asDict().items()))
    if isinstance(v, (list, tuple)):
        return tuple(canon(x) for x in v)
    if isinstance(v, dict):
        return tuple(sorted((k, canon(x)) for k, x in v.items()))
    if hasattr(v, "isoformat"):
        return v.isoformat()
    try:
        import decimal

        if isinstance(v, decimal.Decimal):
            # route through the FLOAT canonicalization (10 sig digits):
            # a raw float(v) here would false-FAIL a DECIMAL-vs-DOUBLE
            # engine pair on values with >10 significant digits
            # (canon(Decimal('1000000.0001')) was 1000000.0001 while
            # canon(1000000.0001) rounds to 1000000.0)
            return canon(float(v))
    except Exception:
        pass
    return str(v)


def spark_type_class(dt) -> str:
    """Coarse type class of a Spark DataType, for oracle-parity checks."""
    s = dt.simpleString()
    if s in ("tinyint", "smallint", "int", "bigint"):
        return "int"
    if s in ("float", "double"):
        return "float"
    if s.startswith("decimal"):
        return "decimal"
    if s == "boolean":
        return "bool"
    if s in ("string", "varchar"):
        return "str"
    if s == "date":
        return "date"
    if s.startswith("timestamp"):
        return "timestamp"
    if s == "binary":
        return "binary"
    if s.startswith("array"):
        return "list"
    if s.startswith("struct") or s.startswith("map"):
        return "struct"
    return s


def arrow_type_class(t) -> str:
    """Coarse type class of a pyarrow DataType (DuckDB result schema).

    DuckDB HUGEINT arrives as decimal128(38,0) via Arrow — exactly the
    class mismatch the driver's hash flags against Spark bigint.
    """
    import pyarrow as pa

    if pa.types.is_boolean(t):
        return "bool"
    if pa.types.is_integer(t):
        return "int"
    if pa.types.is_floating(t):
        return "float"
    if pa.types.is_decimal(t):
        return "decimal"
    if pa.types.is_string(t) or pa.types.is_large_string(t):
        return "str"
    if pa.types.is_date(t):
        return "date"
    if pa.types.is_timestamp(t):
        return "timestamp"
    if pa.types.is_binary(t) or pa.types.is_large_binary(t):
        return "binary"
    if pa.types.is_list(t) or pa.types.is_large_list(t):
        return "list"
    if pa.types.is_struct(t) or pa.types.is_map(t):
        return "struct"
    return str(t)


def rows_canon(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = [tuple(canon(r[i]) for i in order) for r in rows]
    # None-safe total order (only consistency matters, not the order itself)
    return sorted(out, key=lambda row: [(v is None, str(v)) for v in row])


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])
    spark = get_spark("oracle-check")
    con = duckdb.connect()
    for t in ALL_TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")

    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    unknown = only - set(qs)
    if unknown:
        # a typo'd name silently matching nothing would exit 0 and read
        # as a green gate
        print(f"ERROR: unknown query name(s): {sorted(unknown)}")
        sys.exit(2)
    passed = failed = skipped = 0
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            sdf = fn(spark, sf_dir)
            scols = sdf.columns
            srows = [tuple(r) for r in sdf.collect()]
        except Exception as e:
            print(f"FAIL {name}: spark error: {type(e).__name__}: {e}")
            failed += 1
            continue
        if name not in oracles:
            print(f"SKIP {name}: no oracle (rows={len(srows)}) [{time.time()-t0:.1f}s]")
            skipped += 1
            continue
        try:
            atbl = con.execute(oracles[name]).arrow()
            ocols = atbl.column_names
            otypes = {c: arrow_type_class(atbl.schema.field(c).type) for c in ocols}
            # columnar conversion: per-cell column(c)[i].as_py() builds
            # an Arrow scalar per cell and dominated wall time on large
            # results
            orows = list(zip(*(atbl.column(c).to_pylist() for c in ocols))) \
                if ocols else [()] * atbl.num_rows
        except Exception as e:
            print(f"FAIL {name}: duckdb error: {type(e).__name__}: {e}")
            failed += 1
            continue
        problems = []
        if sorted(scols) != sorted(ocols):
            problems.append(f"columns spark={sorted(scols)} oracle={sorted(ocols)}")
        else:
            stypes = {f.name: spark_type_class(f.dataType) for f in sdf.schema.fields}
            mismatched = {
                c: (stypes[c], otypes[c]) for c in scols if stypes[c] != otypes[c]
            }
            if mismatched:
                problems.append(f"type classes differ (spark, oracle): {mismatched}")
        if len(srows) != len(orows):
            problems.append(f"rowcount spark={len(srows)} oracle={len(orows)}")
        if not problems:
            sc, oc = rows_canon(scols, srows), rows_canon(ocols, orows)
            if sc != oc:
                diff = [(a, b) for a, b in zip(sc, oc) if a != b][:3]
                problems.append(f"values differ, first diffs: {diff}")
        if problems:
            print(f"FAIL {name}: " + "; ".join(problems))
            failed += 1
        else:
            print(f"PASS {name} ({len(srows)} rows) [{time.time()-t0:.1f}s]")
            passed += 1
    print(f"\n{passed} passed, {failed} failed, {skipped} skipped (rows-only)")
    sys.exit(1 if failed else 0)


if __name__ == "__main__":
    main()

"""Property-based tests (hypothesis) for the pure driver-side logic:
the upcast lattice and label encoding — the places where a silent
corner-case would corrupt schemas or labels at scale."""

from hypothesis import given, settings
from hypothesis import strategies as st
from pyspark.sql import types as T

from biosets_spark.schema.lattice import unify_schemas, upcast

SCALARS = [
    T.BooleanType(), T.ByteType(), T.ShortType(), T.IntegerType(), T.LongType(),
    T.FloatType(), T.DoubleType(), T.StringType(), T.BinaryType(),
    T.DateType(), T.TimestampType(), T.DecimalType(10, 2), T.DecimalType(20, 0),
    T.NullType(),
]

types_st = st.sampled_from(SCALARS)


@given(types_st, types_st)
@settings(max_examples=200, deadline=None)
def test_upcast_commutative(a, b):
    assert upcast(a, b) == upcast(b, a)


@given(types_st)
@settings(max_examples=50, deadline=None)
def test_upcast_idempotent(a):
    assert upcast(a, a) == a


@given(types_st, types_st, types_st)
@settings(max_examples=300, deadline=None)
def test_upcast_associative(a, b, c):
    assert upcast(upcast(a, b), c) == upcast(a, upcast(b, c))


@given(types_st, types_st)
@settings(max_examples=200, deadline=None)
def test_upcast_absorbs_both(a, b):
    """The result absorbs each input: upcasting an input against the
    result is a no-op (lattice join property)."""
    r = upcast(a, b)
    assert upcast(r, a) == r
    assert upcast(r, b) == r


@given(types_st, types_st, types_st)
@settings(max_examples=200, deadline=None)
def test_unify_order_independent(a, b, c):
    s = lambda ts: T.StructType([T.StructField("x", t) for t in ts])  # noqa: E731
    t1 = unify_schemas([s([a]), s([b]), s([c])])
    t2 = unify_schemas([s([c]), s([a]), s([b])])
    assert t1["x"].dataType == t2["x"].dataType


@given(st.lists(st.text(min_size=1, max_size=8), min_size=1, max_size=10, unique=True))
@settings(max_examples=50, deadline=None)
def test_label_codes_contiguous_and_reversible(labels):
    labels = sorted(labels)
    mapping = {lab: i for i, lab in enumerate(labels)}
    # code range is contiguous 0..n-1 and decode(encode(x)) == x
    assert sorted(mapping.values()) == list(range(len(labels)))
    assert all(labels[mapping[lab]] == lab for lab in labels)

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


# ---- round-4: percent-slice arithmetic + ReadInstruction ----------------

from biosets_spark.operators.split import _round_half_even  # noqa: E402


@given(st.integers(0, 10**9), st.integers(1, 10**6))
@settings(max_examples=300, deadline=None)
def test_round_half_even_matches_fraction(num, den):
    """_round_half_even is exactly Python round() on the rational —
    the reference's 'closest' boundary rule, in exact arithmetic."""
    from fractions import Fraction

    assert _round_half_even(num, den) == round(Fraction(num, den))


@given(st.integers(0, 100_000))
@settings(max_examples=200, deadline=None)
def test_percent_boundaries_telescope(n):
    """Percent boundaries are monotone, anchored at 0 and n, and the
    hundred 1%-unit slices partition the table exactly — no row lost
    or duplicated by rounding."""
    bounds = [_round_half_even(n * p, 100) for p in range(101)]
    assert bounds[0] == 0 and bounds[100] == n
    assert all(b1 <= b2 for b1, b2 in zip(bounds, bounds[1:]))
    assert sum(b2 - b1 for b1, b2 in zip(bounds, bounds[1:])) == n


@given(st.integers(1, 10**6), st.integers(0, 99))
@settings(max_examples=200, deadline=None)
def test_pct1_dropremainder_equal_slices(n, start):
    """pct1_dropremainder: every 1%-unit slice has exactly n//100 rows
    (equal sizes), and the 100 units cover n - n%100 rows."""
    unit = n // 100
    lo, hi = start * unit, (start + 1) * unit
    assert hi - lo == unit
    assert 100 * unit == n - n % 100


@given(
    st.sampled_from(["train", "test", "validation"]),
    st.one_of(st.none(), st.integers(-99, 100)),
    st.one_of(st.none(), st.integers(-99, 100)),
    st.sampled_from(["%", "abs"]),
    st.sampled_from(["closest", "pct1_dropremainder"]),
)
@settings(max_examples=300, deadline=None)
def test_read_instruction_spec_roundtrip(name, a, b, unit, rounding):
    """to_spec() -> from_spec() preserves every ReadInstruction exactly
    (the string grammar is a faithful serialization)."""
    from hypothesis import assume

    from biosets_spark.load import ReadInstruction

    assume(not (rounding == "pct1_dropremainder" and unit != "%"))
    # rounding suffix only exists with a bracket slice in the grammar
    assume(not (a is None and b is None and rounding != "closest"))
    ri = ReadInstruction(name, from_=a, to=b, unit=unit, rounding=rounding)
    back = ReadInstruction.from_spec(ri.to_spec())
    if a is None and b is None:
        assert back._parts == [(name, None, None, "abs", "closest")]
    else:
        assert back._parts == [(name, a, b, unit, rounding)]
    assert back.to_spec() == ri.to_spec()


# --------------------------------------------------------------- avro_py
# Roundtrip identity for the stdlib Avro container codec (r6): any
# value tree a supported schema admits must survive
# write_container -> iter_records bit-exactly, under both codecs.

_AVRO_LEAF = st.sampled_from(["long", "int", "double", "boolean", "string", "bytes"])


def _leaf_values(t):
    return {
        "long": st.integers(min_value=-(2**62), max_value=2**62),
        "int": st.integers(min_value=-(2**31), max_value=2**31 - 1),
        "double": st.floats(allow_nan=False, width=64),
        "boolean": st.booleans(),
        "string": st.text(max_size=40),
        "bytes": st.binary(max_size=40),
    }[t]


@given(
    st.lists(_AVRO_LEAF, min_size=1, max_size=5),
    st.data(),
    st.sampled_from(["null", "deflate"]),
)
@settings(max_examples=60, deadline=None)
def test_avro_py_roundtrip_property(leaf_types, data, codec):
    import tempfile

    from biosets_spark.sources import avro_py as A

    fields = []
    for i, t in enumerate(leaf_types):
        # alternate plain / nullable / array / map shapes over the leaf
        shape = i % 4
        if shape == 0:
            ftype = t
        elif shape == 1:
            ftype = ["null", t]
        elif shape == 2:
            ftype = {"type": "array", "items": t}
        else:
            ftype = {"type": "map", "values": t}
        fields.append({"name": f"f{i}", "type": ftype})
    schema = {"type": "record", "name": "R", "fields": fields}

    def value_for(i, t):
        shape = i % 4
        leaf = _leaf_values(t)
        if shape == 0:
            return data.draw(leaf)
        if shape == 1:
            return data.draw(st.none() | leaf)
        if shape == 2:
            return data.draw(st.lists(leaf, max_size=5))
        return data.draw(
            st.dictionaries(st.text(max_size=8), leaf, max_size=4)
        )

    rows = [
        tuple(value_for(i, t) for i, t in enumerate(leaf_types))
        for _ in range(data.draw(st.integers(min_value=0, max_value=20)))
    ]
    with tempfile.NamedTemporaryFile(suffix=".avro") as f:
        A.write_container(f.name, schema, rows, codec=codec,
                          records_per_block=7)
        back = list(A.iter_records(open(f.name, "rb").read()))
    assert len(back) == len(rows)
    for row, dec in zip(rows, back):
        for i, t in enumerate(leaf_types):
            assert dec[f"f{i}"] == row[i], (t, i)


@given(
    w=st.integers(min_value=1, max_value=40),
    h=st.integers(min_value=1, max_value=30),
    n_colors=st.integers(min_value=2, max_value=16),
    seed=st.integers(min_value=0, max_value=2**31 - 1),
    interlaced=st.booleans(),
)
@settings(max_examples=40, deadline=None)
def test_gif_lzw_roundtrip_property(w, h, n_colors, seed, interlaced):
    """Property: any palette-indexed image survives the test encoder ->
    decode_gif roundtrip with exact dimensions and channel means
    (exercises LZW width growth, clear resets, KwKwK, interlace
    reassembly across the parameter space)."""
    import numpy as np

    from biosets_spark.operators.multimodal import decode_gif
    from tests.test_misc import _gif_bytes

    rng = np.random.RandomState(seed)
    palette = [tuple(int(v) for v in rng.randint(0, 256, 3))
               for _ in range(n_colors)]
    min_code = max(2, (n_colors - 1).bit_length())
    idx = rng.randint(0, n_colors, size=w * h)
    if interlaced:
        rows = idx.reshape(h, w)
        order = np.concatenate([np.arange(0, h, 8), np.arange(4, h, 8),
                                np.arange(2, h, 4), np.arange(1, h, 2)])
        payload = rows[order].ravel()
    else:
        payload = idx
    gif = _gif_bytes(payload, palette, w, h, min_code_size=min_code,
                     interlaced=interlaced)
    gw, gh, mr, mg, mb = decode_gif(gif)
    px = np.array(palette)[idx]
    assert (gw, gh) == (w, h)
    assert abs(mr - px[:, 0].mean()) < 1e-9
    assert abs(mg - px[:, 1].mean()) < 1e-9
    assert abs(mb - px[:, 2].mean()) < 1e-9


@given(
    w=st.integers(min_value=1, max_value=32),
    h=st.integers(min_value=1, max_value=24),
    gray=st.booleans(),
    bo=st.sampled_from(["<", ">"]),
    rps=st.integers(min_value=1, max_value=25),
    seed=st.integers(min_value=0, max_value=2**31 - 1),
)
@settings(max_examples=40, deadline=None)
def test_tiff_roundtrip_property(w, h, gray, bo, rps, seed):
    """Property: any 8-bit gray/RGB image survives the test TIFF
    writer -> decode_tiff roundtrip across endianness and strip
    heights (multi-strip reassembly, value-offset vs inline fields)."""
    import numpy as np

    from biosets_spark.operators.multimodal import decode_tiff
    from tests.test_misc import _tiff_bytes

    rng = np.random.RandomState(seed)
    shape = (h, w) if gray else (h, w, 3)
    px = rng.randint(0, 256, size=shape)
    gw, gh, mr, mg, mb = decode_tiff(
        _tiff_bytes(px, bo=bo, rows_per_strip=min(rps, h)))
    assert (gw, gh) == (w, h)
    if gray:
        assert mr == mg == mb and abs(mr - px.mean()) < 1e-9
    else:
        assert abs(mr - px[..., 0].mean()) < 1e-9
        assert abs(mb - px[..., 2].mean()) < 1e-9


@given(
    w=st.integers(min_value=1, max_value=24),
    h=st.integers(min_value=1, max_value=20),
    ct=st.sampled_from([0, 2, 3, 4, 6]),
    interlace=st.booleans(),
    seed=st.integers(min_value=0, max_value=2**31 - 1),
)
@settings(max_examples=50, deadline=None)
def test_png_roundtrip_property(w, h, ct, interlace, seed):
    """Property: any 8-bit image of every PNG color type survives the
    test encoder -> decode_png roundtrip with exact dimensions and
    channel means, across random per-row filter types and Adam7
    (ragged pass dims, filter reconstruction, palette mapping)."""
    import numpy as np

    from biosets_spark.operators.multimodal import decode_png
    from tests.test_misc import _png_bytes

    rng = np.random.RandomState(seed)
    channels = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}[ct]
    plte = None
    if ct == 3:
        plte = [tuple(int(v) for v in rng.randint(0, 256, 3))
                for _ in range(8)]
        px = rng.randint(0, 8, size=(h, w, 1)).astype(np.uint8)
        exp = np.array(plte)[px[..., 0]]
    else:
        px = rng.randint(0, 256, size=(h, w, channels), dtype=np.uint8)
        if ct == 0:
            exp = np.repeat(px, 3, axis=2)
        elif ct == 4:
            exp = np.repeat(px[..., :1], 3, axis=2)
        else:
            exp = px[..., :3]
    if interlace:
        passes = []
        for x0, y0, dx, dy in ((0, 0, 8, 8), (4, 0, 8, 8), (0, 4, 4, 8),
                               (2, 0, 4, 4), (0, 2, 2, 4), (1, 0, 2, 2),
                               (0, 1, 1, 2)):
            sub = px[y0::dy, x0::dx]
            passes.append([sub[r].tobytes() for r in range(sub.shape[0])]
                          if sub.size else [])
        png = _png_bytes(w, h, 8, ct, passes, plte=plte, interlace=1)
    else:
        rows = [px[r].tobytes() for r in range(h)]
        filters = [int(f) for f in rng.randint(0, 5, size=h)]
        png = _png_bytes(w, h, 8, ct, rows, plte=plte, filters=filters)
    gw, gh, mr, mg, mb = decode_png(png)
    assert (gw, gh) == (w, h)
    assert abs(mr - exp[..., 0].mean()) < 1e-9
    assert abs(mg - exp[..., 1].mean()) < 1e-9
    assert abs(mb - exp[..., 2].mean()) < 1e-9


@given(data=st.binary(min_size=0, max_size=400),
       seed=st.integers(min_value=0, max_value=2**31 - 1))
@settings(max_examples=80, deadline=None)
def test_png_fuzz_never_escapes_valueerror(data, seed):
    """Fuzz: random bytes after the PNG signature must either decode
    or raise ValueError — never IndexError/struct.error/zlib.error."""
    import numpy as np

    from biosets_spark.operators.multimodal import decode_png
    from tests.test_misc import _png_bytes

    rng = np.random.RandomState(seed)
    px = rng.randint(0, 256, size=(3, 3, 3), dtype=np.uint8)
    good = _png_bytes(3, 3, 8, 2, [px[r].tobytes() for r in range(3)])
    # splice random bytes into a valid payload at a random offset
    cut = seed % len(good)
    for payload in (b"\x89PNG\r\n\x1a\n" + data,
                    good[:cut] + data + good[cut + len(data):]):
        try:
            decode_png(payload)
        except ValueError:
            pass


@given(
    tgt_keys=st.lists(st.integers(0, 12), min_size=0, max_size=8, unique=True),
    src_keys=st.lists(st.integers(0, 12), min_size=0, max_size=8, unique=True),
    ops=st.lists(st.sampled_from(["U", "D", "I"]), min_size=8, max_size=8),
    seed=st.integers(0, 2**31 - 1),
)
@settings(max_examples=25, deadline=None)
def test_merge_into_matches_reference_semantics(tgt_keys, src_keys, ops,
                                                seed):
    """Property: merge_into equals a pure-Python reference MERGE for
    any target/source key overlap and any per-row clause mix
    (update / delete / insert-eligible)."""
    import numpy as np
    from pyspark.sql import functions as F
    from pyspark.sql.functions import col

    from biosets_spark.operators.merge import merge_into
    from biosets_spark.session import get_spark

    spark_session = get_spark("biosets-spark-tests", shuffle_partitions=8)
    rng = np.random.RandomState(seed)
    tgt_rows = [(k, float(rng.randint(0, 100))) for k in tgt_keys]
    src_rows = [(k, ops[i % len(ops)], float(rng.randint(100, 200)))
                for i, k in enumerate(src_keys)]
    tgt = spark_session.createDataFrame(tgt_rows, "k long, price double") \
        if tgt_rows else spark_session.createDataFrame([], "k long, price double")
    src = spark_session.createDataFrame(src_rows, "k long, op string, new_price double") \
        if src_rows else spark_session.createDataFrame([], "k long, op string, new_price double")

    out = merge_into(
        tgt, src, on="k",
        matched_update={"price": col("__s.new_price")},
        matched_delete=col("__s.op") == "D",
        matched_condition=col("__s.op") == "U",
        not_matched_insert={"price": col("__s.new_price")},
    )
    got = sorted((r.k, r.price) for r in out.collect())

    # pure-Python reference MERGE
    src_by_k = {k: (op, np_) for k, op, np_ in src_rows}
    exp = []
    for k, price in tgt_rows:
        if k in src_by_k:
            op, np_ = src_by_k[k]
            if op == "D":
                continue
            exp.append((k, np_ if op == "U" else price))
        else:
            exp.append((k, price))
    for k, (op, np_) in src_by_k.items():
        if k not in dict(tgt_rows):
            exp.append((k, np_))  # insert clause takes every unmatched source row
    assert got == sorted(exp)

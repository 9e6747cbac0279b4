"""Property-based tests (hypothesis) — beyond the reference's test strategy
(SURVEY §5: the reference has none). Pure-function properties only (no Ray):
codec roundtrips on arbitrary images, sketch merge laws, duration parsing,
threshold algebra."""

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from raycontract.compile import evaluate_threshold
from raycontract.functions.codecs import decode_image, encode_image, phash64
from raycontract.functions.durations import period_to_seconds
from raycontract.functions.hashing import splitmix64
from raycontract.functions.sketches import CategoricalCounts, HyperLogLog, MisraGries, TDigest

dims = st.integers(min_value=1, max_value=40)


@settings(max_examples=30, deadline=None)
@given(h=dims, w=dims, fmt=st.sampled_from(["png", "bmp", "ppm"]), seed=st.integers(0, 2**31))
def test_codec_roundtrip_any_image(h, w, fmt, seed):
    rng = np.random.default_rng(seed)
    img = rng.integers(0, 256, (h, w, 3), dtype=np.uint8)
    assert np.array_equal(decode_image(encode_image(img, fmt), fmt), img)


@settings(max_examples=30, deadline=None)
@given(h=st.integers(2, 40), w=st.integers(2, 40), seed=st.integers(0, 2**31))
def test_phash_deterministic_and_in_range(h, w, seed):
    rng = np.random.default_rng(seed)
    img = rng.integers(0, 256, (h, w, 3), dtype=np.uint8)
    p = phash64(img)
    assert p == phash64(img)
    assert -(2**63) <= p < 2**63


@settings(max_examples=50, deadline=None)
@given(n=st.integers(1, 10000), unit=st.sampled_from(["s", "m", "h", "d", "w", "y"]))
def test_period_simple_positive(n, unit):
    assert period_to_seconds(f"{n}{unit}") > 0


@settings(max_examples=30, deadline=None)
@given(data=st.lists(st.floats(min_value=-1e6, max_value=1e6, allow_nan=False),
                     min_size=2, max_size=500),
       q=st.floats(min_value=0.0, max_value=1.0))
def test_tdigest_quantile_within_bounds(data, q):
    td = TDigest()
    td.add(np.array(data))
    v = td.quantile(q)
    assert min(data) - 1e-6 <= v <= max(data) + 1e-6


@settings(max_examples=20, deadline=None)
@given(a=st.lists(st.integers(0, 10**6), max_size=300),
       b=st.lists(st.integers(0, 10**6), max_size=300),
       c=st.lists(st.integers(0, 10**6), max_size=300))
def test_hll_merge_commutative_associative(a, b, c):
    def hll(vals):
        h = HyperLogLog(p=8)
        if vals:
            h.add_hashed(splitmix64(np.array(vals, dtype=np.uint64)))
        return h

    ha, hb, hc = hll(a), hll(b), hll(c)
    ab = ha.merge(hb)
    ba = hb.merge(ha)
    assert (ab.registers == ba.registers).all()
    assert (ab.merge(hc).registers == ha.merge(hb.merge(hc)).registers).all()


@settings(max_examples=30, deadline=None)
@given(vals=st.lists(st.sampled_from("abcdef"), min_size=1, max_size=500))
def test_misra_gries_total_preserved(vals):
    mg = MisraGries(k=4)
    mg.add(vals)
    assert mg.n == len(vals)
    # lower-bound property: counter ≤ true count
    from collections import Counter

    truth = Counter(vals)
    for v, c in mg.counters.items():
        assert c <= truth[v]


@settings(max_examples=50, deadline=None)
@given(v=st.floats(allow_nan=False, allow_infinity=False, width=32),
       lo=st.floats(allow_nan=False, allow_infinity=False, width=32),
       hi=st.floats(allow_nan=False, allow_infinity=False, width=32))
def test_threshold_between_consistency(v, lo, hi):
    if lo > hi:
        lo, hi = hi, lo
    assert evaluate_threshold(v, ("between", (lo, hi))) == \
        (not evaluate_threshold(v, ("not between", (lo, hi))))


@settings(max_examples=20, deadline=None)
@given(items=st.lists(st.tuples(st.sampled_from("xyz"), st.integers(1, 100)),
                      max_size=50))
def test_categorical_counts_merge_total(items):
    a, b = CategoricalCounts(), CategoricalCounts()
    half = len(items) // 2
    a.add([k for k, _ in items[:half]], [c for _, c in items[:half]])
    b.add([k for k, _ in items[half:]], [c for _, c in items[half:]])
    assert a.merge(b).total() == sum(c for _, c in items)


# ------------------------------------------------- r2: format round-trips

_ident = st.from_regex(r"[a-z][a-z0-9_]{0,10}", fullmatch=True)

_scalar_types = st.sampled_from(
    ["string", "int", "long", "float", "double", "boolean", "date",
     "timestamp", "timestamp_ntz", "bytes", "time"])


@st.composite
def _flat_field(draw):
    from raycontract.contract import Field

    f = Field(type=draw(_scalar_types))
    if draw(st.booleans()):
        f.required = True
    if draw(st.booleans()):
        f.unique = True
    if f.type == "string" and draw(st.booleans()):
        f.maxLength = draw(st.integers(1, 100))
    if f.type in ("int", "long", "double", "float") and draw(st.booleans()):
        f.minimum = draw(st.integers(-1000, 1000))
    return f


@st.composite
def _flat_spec(draw):
    from raycontract.contract import DataContractSpecification, Info, Model

    spec = DataContractSpecification(dataContractSpecification="1.1.0")
    spec.id = draw(_ident)
    spec.info = Info(title="p", version="1.0.0")
    model = Model()
    names = draw(st.lists(_ident, min_size=1, max_size=6, unique=True))
    for n in names:
        model.fields[n] = draw(_flat_field())
    spec.models[draw(_ident)] = model
    return spec


@settings(max_examples=25, deadline=None)
@given(spec=_flat_spec())
def test_dcs_yaml_roundtrip_property(spec):
    """export→parse→export is a fixed point and preserves every field attr."""
    from raycontract.contract import DataContractSpecification
    from raycontract.export.dcs import export_dcs_yaml

    txt = export_dcs_yaml(spec)
    back = DataContractSpecification.from_string(txt, validate=True)
    assert export_dcs_yaml(back) == txt
    mname = next(iter(spec.models))
    for n, f in spec.models[mname].fields.items():
        g = back.models[mname].fields[n]
        for attr in ("type", "required", "unique", "maxLength", "minimum"):
            assert getattr(g, attr) == getattr(f, attr), (n, attr)


@settings(max_examples=15, deadline=None)
@given(spec=_flat_spec())
def test_sql_ddl_import_roundtrip_property(spec):
    """contract → DuckDB DDL → import preserves type/required for every
    scalar field (modulo the documented lossy physical mappings)."""
    from raycontract.export.sql import to_sql_ddl
    from raycontract.imports.sql import import_sql

    ddl = to_sql_ddl(spec, dialect="duckdb")
    back = import_sql(ddl)
    mname = next(iter(spec.models))
    equivalent = {"float": {"float"}, "double": {"double"},
                  "int": {"int"}, "long": {"long"}, "string": {"string"},
                  "boolean": {"boolean"}, "bytes": {"bytes"}, "date": {"date"},
                  "time": {"time"}, "timestamp": {"timestamp"},
                  "timestamp_ntz": {"timestamp_ntz"}}
    for n, f in spec.models[mname].fields.items():
        g = back.models[mname].fields[n]
        assert g.type in equivalent[f.type], (n, f.type, g.type)
        assert bool(g.required) == bool(f.required), n


@settings(max_examples=20, deadline=None)
@given(spec=_flat_spec())
def test_avro_import_roundtrip_property(spec):
    from raycontract.export.avro import export_avro
    from raycontract.imports.avro import import_avro

    back = import_avro(export_avro(spec))
    mname = next(iter(spec.models))
    amap = {"time": "time", "timestamp": "timestamp", "timestamp_ntz": "timestamp_ntz"}
    for n, f in spec.models[mname].fields.items():
        g = back.models[mname].fields[n]
        assert bool(g.required) == bool(f.required), n
        if f.type in ("string", "int", "long", "float", "double", "boolean",
                      "bytes", "date"):
            assert g.type == f.type, (n, f.type, g.type)

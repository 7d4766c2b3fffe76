"""Property-based parity for the mapping-DSL compiler.

An independent row-at-a-time interpreter of the DOCUMENTED semantics
(schema/dsl.py's parity contract with transformer.py:63-108: None==absent,
required/PK rejection, defaults, try-cast chains with first-success-wins
unified to string) is cross-checked against the compiled Column-expression
path over hypothesis-generated mappings and documents. Any divergence
between the declarative compile and the operational spec is a bug in one
of them.

Value classes are restricted to representations both paths render
identically (integers, short decimals, clearly-numeric / clearly-non-
numeric strings) — rendering edge cases are pinned by tests/test_dsl.py.
"""

import math

from hypothesis import given, settings
from hypothesis import strategies as st
from pyspark.sql import types as T

from arango_clickhouse_replica_spark.schema.dsl import TableMapping, apply_mapping

FIELDS = ["sfield", "ifield", "dfield"]

SOURCE_SCHEMA = T.StructType(
    [
        T.StructField("rid", T.LongType()),
        T.StructField("sfield", T.StringType()),
        T.StructField("ifield", T.LongType()),
        T.StructField("dfield", T.DoubleType()),
    ]
)

s_values = st.one_of(
    st.none(),
    st.sampled_from(["7", "-3", "42", "abc", "x1", "1.5", ""]),
)
i_values = st.one_of(st.none(), st.integers(min_value=-1000, max_value=1000))
d_values = st.one_of(st.none(), st.sampled_from([0.0, 1.0, -2.5, 3.75, 100.5]))

documents = st.lists(
    st.tuples(s_values, i_values, d_values), min_size=1, max_size=30
)

prop_types = st.sampled_from(["str", "int", "float", ["int", "str"]])


@st.composite
def mappings(draw):
    props = {"pk": {"type": "int", "ref": "rid"}}
    n = draw(st.integers(min_value=1, max_value=3))
    for i in range(n):
        p = {
            "type": draw(prop_types),
            "ref": draw(st.sampled_from(FIELDS)),
        }
        if draw(st.booleans()):
            p["required"] = True
        elif draw(st.booleans()):
            p["default"] = draw(st.sampled_from([0, "d", 1.5]))
        props[f"p{i}"] = p
    return {"schema": {"primary_key": ["pk"], "properties": props}}


# ---- the independent operational interpreter -------------------------------


def _try_int(v):
    """Mirror of Spark try_cast -> long over our value classes."""
    if isinstance(v, bool):
        return None
    if isinstance(v, int):
        return v
    if isinstance(v, float):
        return math.trunc(v)
    if isinstance(v, str):
        s = v.strip()
        if s and (s.lstrip("+-").isdigit()):
            return int(s)
        return None
    return None


def _try_float(v):
    if isinstance(v, bool):
        return None
    if isinstance(v, (int, float)):
        return float(v)
    if isinstance(v, str):
        try:
            return float(v.strip())
        except ValueError:
            return None
    return None


def _fmt_double(x: float) -> str:
    """Spark's string rendering of DOUBLE (always with a decimal point)."""
    return repr(float(x))


def _cast(kind, v):
    """-> (ok, value). Mirrors one cast builder."""
    if kind == "str":
        if isinstance(v, float):
            return True, _fmt_double(v)
        return True, str(v)
    if kind == "int":
        r = _try_int(v)
        return (r is not None), r
    if kind == "float":
        r = _try_float(v)
        return (r is not None), r
    raise AssertionError(kind)


def interpret(mapping: dict, doc: dict):
    """-> (row dict) | None if rejected."""
    out = {}
    schema = mapping["schema"]
    for name, p in schema["properties"].items():
        casts = p["type"] if isinstance(p["type"], list) else [p["type"]]
        v = doc.get(p.get("ref", name))
        present = v is not None
        is_pk = name in schema["primary_key"]
        if not present:
            if is_pk or p.get("required"):
                return None
            out[name] = p["default"] if "default" in p else None
            # defaults are compile-time cast to the output type
            if out[name] is not None:
                ok, out[name] = _cast(casts[0] if len(casts) == 1 else "str", out[name])
            continue
        if len(casts) == 1:
            ok, r = _cast(casts[0], v)
            if not ok:
                return None
            out[name] = r
        else:  # union: first success wins, unified to string
            for kind in casts:
                ok, r = _cast(kind, v)
                if ok:
                    ok2, r = _cast("str", r)
                    break
            if not ok:
                return None
            out[name] = r
    return out


@settings(max_examples=12, deadline=None)
@given(mapping=mappings(), docs=documents)
def test_compiled_matches_interpreter(spark, mapping, docs):
    rows = [(i, s, iv, dv) for i, (s, iv, dv) in enumerate(docs)]
    df = spark.createDataFrame(rows, SOURCE_SCHEMA)
    tm = TableMapping.from_dict(mapping)
    result = apply_mapping(df, tm)

    got = sorted(
        (tuple(r[f.name] for f in result.valid.schema.fields) for r in result.valid.collect()),
        key=repr,
    )
    want = []
    for i, (s, iv, dv) in enumerate(docs):
        doc = {"rid": i, "sfield": s, "ifield": iv, "dfield": dv}
        r = interpret(mapping, doc)
        if r is not None:
            want.append(tuple(r[f.name] for f in result.valid.schema.fields))
    want.sort(key=repr)
    assert got == want

    n_rejected = result.rejected.count()
    assert n_rejected == len(docs) - len(want)

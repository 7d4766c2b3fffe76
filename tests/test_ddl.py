"""DDL generation from TableMapping (schema/ddl.py): must reproduce the
reference's hand-written ClickHouse DDL from the same YAML mapping
(/root/reference/tables/test.yaml), derive Buffer DDL like
replication/schema/helper.py:97-122, and answer the PK-type lookup of
test/test_schema.py:11."""

import yaml

from arango_clickhouse_replica_spark.schema.ddl import (
    buffer_table_ddl,
    clickhouse_type,
    create_table_ddl,
    primary_key_type,
)
from arango_clickhouse_replica_spark.schema.dsl import Property, TableMapping

REF_YAML = "/root/reference/tables/test.yaml"


def _ref():
    with open(REF_YAML) as f:
        return yaml.safe_load(f)


def test_create_table_ddl_matches_reference_verbatim():
    d = _ref()
    mapping = TableMapping.from_dict(d)
    ddl = create_table_ddl(
        mapping, order_by=("Id", "Name"), settings={"index_granularity": 256}
    )
    assert ddl == d["table"]


def test_create_table_ddl_defaults_order_by_to_pk():
    mapping = TableMapping.from_dict(_ref())
    ddl = create_table_ddl(mapping)
    assert "PRIMARY KEY (Id)" in ddl
    assert "ORDER BY (Id)" in ddl
    assert "ENGINE = ReplacingMergeTree(_ver)" in ddl
    assert "SETTINGS" not in ddl


def test_buffer_ddl_matches_helper_semantics():
    d = _ref()
    mapping = TableMapping.from_dict(d)
    ddl = buffer_table_ddl(mapping, "mydb", d["buffer"])
    # helper.py:110-113: Buffer(db, table, num_layers, min_time, max_time,
    # min_rows, max_rows, min_bytes, max_bytes)
    assert "CREATE TABLE mydb.Test_Buffer" in ddl
    assert (
        "ENGINE = Buffer(mydb, Test, 1, 15, 30, 1000, 2000, 10000000, 20000000)"
        in ddl
    )
    # same columns as the main table
    for col in ("`Id`", "`Name`", "`Email`", "`Answers`", "`SubmittedOn`",
                "`_ver`", "`_rev`", "`_deleted`"):
        assert col in ddl


def test_primary_key_type_prefers_ch_type():
    # the shape of /root/reference/test/test_schema.py:7-31 — pk with an
    # explicit ch_type annotation
    mapping = TableMapping.from_dict(
        {
            "table_name": "T",
            "schema": {
                "properties": {
                    "Id": {"type": "int", "ch_type": "UInt32", "ref": "_key"},
                    "Name": {"type": "str"},
                },
                "primary_key": "Id",
            },
        }
    )
    assert primary_key_type(mapping) == "UInt32"


def test_meta_columns_injected_when_mapping_omits_them():
    # A user mapping without _ver/_deleted (the pipeline re-attaches them
    # to every batch) must still get a valid ReplacingMergeTree(_ver)
    # target: both columns injected, _rev NOT invented.
    mapping = TableMapping.from_dict(
        {
            "table_name": "T",
            "schema": {
                "properties": {
                    "Id": {"type": "int", "ref": "_key"},
                    "Name": {"type": "str"},
                },
                "primary_key": "Id",
            },
        }
    )
    ddl = create_table_ddl(mapping)
    assert "`_ver`" in ddl and "UInt64" in ddl
    assert "`_deleted`" in ddl and "UInt8" in ddl
    assert "`_rev`" not in ddl
    # injected metas come after user columns
    assert ddl.index("`Name`") < ddl.index("`_ver`") < ddl.index("`_deleted`")


def test_multiple_settings_emit_one_clause():
    mapping = TableMapping.from_dict(_ref())
    ddl = create_table_ddl(
        mapping, settings={"index_granularity": 256, "ttl_only_drop_parts": 1}
    )
    assert ddl.count("SETTINGS") == 1
    assert "SETTINGS index_granularity = 256, ttl_only_drop_parts = 1" in ddl


def test_type_derivation_fallbacks():
    assert clickhouse_type(Property("x", "float", "x")) == "Float64"
    assert clickhouse_type(Property("x", "[List, int]", "x")) == "Array(Int64)"
    assert clickhouse_type(Property("x", ["int", "str"], "x")) == "String"
    assert clickhouse_type(Property("_deleted", "int", "_deleted")) == "UInt8"
    assert clickhouse_type(Property("x", "int", "x", ch_type="UInt16")) == "UInt16"

"""Target-table DDL generation from a ``TableMapping``.

The reference carries the ``CREATE TABLE`` DDL as a literal string in
each ``tables/*.yaml`` (``/root/reference/tables/test.yaml:2-16``), uses
the per-property ``ch_type`` for primary-key type lookups
(``/root/reference/replication/schema/helper.py:79-86``,
``test/test_schema.py:11``), and derives the Buffer-table DDL from the
main table's schema plus the YAML ``buffer`` block
(``replication/schema/helper.py:97-122``). This module closes the loop:
it GENERATES the ``ReplacingMergeTree(_ver)`` DDL (and Buffer DDL)
directly from the parsed mapping, so a user pointing the JDBC sink
(``sources/jdbc_sink.py``) at a fresh ClickHouse can create the target
without hand-writing DDL.

Type derivation: an explicit ``ch_type`` wins; otherwise the DSL cast
name maps to its natural ClickHouse type; the three mandatory metadata
columns are pinned to the engine contract ``_ver UInt64 / _rev String /
_deleted UInt8`` (``readme.md:91``, ``tables/test.yaml:10-12``)
regardless of their declared DSL cast (test.yaml declares them as
``int``/``str`` for the TRANSFORM, while the DDL needs the storage
types — the reference resolves this by hand-writing the DDL; we pin).
"""

from __future__ import annotations

from collections.abc import Mapping, Sequence

from .dsl import Property, TableMapping

#: DSL cast name -> natural ClickHouse column type.
_CH_TYPES: dict[str, str] = {
    "str": "String",
    "int": "Int64",
    "float": "Float64",
    "bool": "UInt8",
    "from_datetime": "Nullable(DateTime)",
    "[List, str]": "Array(String)",
    "[List, int]": "Array(Int64)",
    "decode_json": "String",  # ClickHouse pre-Map storage: JSON as String
    "to_array": "Array(String)",
}

#: Mandatory metadata columns' storage types (readme.md:91).
_META_TYPES = {"_ver": "UInt64", "_rev": "String", "_deleted": "UInt8"}


def clickhouse_type(prop: Property) -> str:
    """ClickHouse column type for one mapped property."""
    if prop.name in _META_TYPES:
        return _META_TYPES[prop.name]
    if prop.ch_type:
        return prop.ch_type
    t = prop.type
    key = str(t) if isinstance(t, list) else t
    if isinstance(t, list) and key not in _CH_TYPES:
        return "String"  # union chains unify to string (schema/dsl.py)
    if key not in _CH_TYPES:
        raise KeyError(f"no ClickHouse type mapping for cast {key!r}; "
                       f"declare ch_type on property {prop.name!r}")
    return _CH_TYPES[key]


def primary_key_type(mapping: TableMapping) -> str:
    """``ch_type`` of the primary-key property (helper.py:79-86 parity;
    the reference RETURNS a KeyError instance on a miss — an obvious bug
    — we raise)."""
    for prop in mapping.properties:
        if prop.name in mapping.primary_key:
            if prop.ch_type:
                return prop.ch_type
            return clickhouse_type(prop)
    raise KeyError("primary key is not found")


def _column_lines(mapping: TableMapping) -> list[str]:
    # User columns in mapping order; the metadata trio last, in the
    # contract order _ver, _rev, _deleted (readme.md:91) regardless of
    # where the YAML declares them. `_ver` and `_deleted` are injected
    # when the mapping omits them: the engine clause references `_ver`
    # and soft-delete reads filter `_deleted`, and the pipeline
    # re-attaches both to every batch whether or not the mapping
    # declares them (streaming/pipeline.py) — so the target table must
    # always carry them. `_rev` stays declaration-only (nothing in the
    # engine depends on it).
    meta_order = list(_META_TYPES)
    props = list(mapping.properties)
    declared = {p.name for p in props}
    for name in ("_ver", "_deleted"):
        if name not in declared:
            props.append(Property(name=name, type="int", ref=name))
    props = sorted(
        props,
        key=lambda p: meta_order.index(p.name) if p.name in _META_TYPES else -1,
    )
    lines = []
    for prop in props:
        name = f"`{prop.name}`"
        pad = max(len(name) + 1, 17)
        lines.append(f"    {name:<{pad}}{clickhouse_type(prop)}")
    return lines


def create_table_ddl(
    mapping: TableMapping,
    *,
    order_by: Sequence[str] | None = None,
    settings: Mapping[str, object] | None = None,
) -> str:
    """``CREATE TABLE ... ENGINE = ReplacingMergeTree(_ver)`` DDL.

    ``order_by`` defaults to the mapping's primary key; pass a wider
    tuple for a composite sort key (test.yaml orders by (Id, Name) while
    the mapping's primary_key is just Id). Layout matches the reference's
    hand-written DDL byte for byte (tables/test.yaml:2-16).
    """
    keys = tuple(order_by) if order_by else mapping.primary_key
    key_list = ", ".join(keys)
    lines = [f"CREATE TABLE {mapping.table_name}", "("]
    lines.append(",\n".join(_column_lines(mapping)))
    lines.append(") ENGINE = ReplacingMergeTree(_ver)")
    lines.append(f"      PRIMARY KEY ({key_list})")
    lines.append(f"      ORDER BY ({key_list})")
    if settings:
        # ClickHouse takes ONE comma-separated SETTINGS clause.
        joined = ", ".join(f"{k} = {v}" for k, v in settings.items())
        lines.append(f"      SETTINGS {joined}")
    return "\n".join(lines) + "\n"


#: Buffer() engine argument order (helper.py:110-113).
_BUFFER_ARGS = ("num_layers", "min_time", "max_time", "min_rows", "max_rows",
                "min_bytes", "max_bytes")


def buffer_table_ddl(mapping: TableMapping, db: str, buffer: Mapping[str, int]) -> str:
    """Buffer-table DDL in front of the main table (K5 write path).

    Mirrors ``create_buffer_table`` (helper.py:97-122): same columns, the
    engine swapped for ``Buffer(db, table, num_layers, min_time, max_time,
    min_rows, max_rows, min_bytes, max_bytes)``, table renamed to
    ``{db}.{table}_Buffer``.
    """
    args = ", ".join(str(buffer[k]) for k in _BUFFER_ARGS)
    lines = [f"CREATE TABLE {db}.{mapping.table_name}_Buffer", "("]
    lines.append(",\n".join(_column_lines(mapping)))
    lines.append(f") ENGINE = Buffer({db}, {mapping.table_name}, {args})")
    return "\n".join(lines) + "\n"

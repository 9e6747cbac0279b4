"""Contract → SQL DDL / SELECT query exporter.

≅ the reference's ``export/sql_converter.py`` (``to_sql_ddl`` /
``to_sql_query``) with the per-dialect type maps of
``export/sql_type_converter.py`` re-derived from the public dialect
documentation: same output shape (``-- Data Contract: <id>`` header,
two-space indent, ``not null`` / ``primary key`` qualifiers, databricks
``CREATE OR REPLACE`` + COMMENT clauses), dialects duckdb / postgres /
snowflake / mysql / databricks / sqlserver / bigquery (duckdb is the engine's
native dialect — the same mapping ``raycontract.types`` uses for the
field_type check).

Per-field overrides via ``config["<dialect>Type"]`` (e.g. ``postgresType``)
take precedence, as in the reference.
"""

from __future__ import annotations

from typing import Optional

from raycontract.contract import DataContractSpecification, Field, Model

_SIMPLE: dict[str, dict[str, str]] = {
    # dialect → {logical type → physical}
    "duckdb": {
        "string": "VARCHAR", "text": "VARCHAR", "varchar": "VARCHAR",
        "boolean": "BOOLEAN", "float": "FLOAT", "double": "DOUBLE",
        "int": "INTEGER", "integer": "INTEGER", "long": "BIGINT", "bigint": "BIGINT",
        "date": "DATE", "time": "TIME",
        "timestamp": "TIMESTAMP WITH TIME ZONE", "timestamp_tz": "TIMESTAMP WITH TIME ZONE",
        "timestamp_ntz": "TIMESTAMP", "bytes": "BLOB", "null": "NULL",
    },
    "postgres": {
        "string": "text", "text": "text", "varchar": "text",
        "boolean": "boolean", "float": "real", "double": "double precision",
        "int": "integer", "integer": "integer", "long": "bigint", "bigint": "bigint",
        "date": "date", "time": "time",
        "timestamp": "timestamptz", "timestamp_tz": "timestamptz",
        "timestamp_ntz": "timestamp", "bytes": "bytea",
        "object": "jsonb", "record": "jsonb", "struct": "jsonb", "null": "text",
    },
    "snowflake": {
        "string": "TEXT", "text": "TEXT", "varchar": "TEXT",
        "boolean": "BOOLEAN", "float": "FLOAT", "double": "FLOAT",
        "int": "NUMBER", "integer": "NUMBER", "long": "NUMBER", "bigint": "NUMBER",
        "number": "NUMBER", "decimal": "NUMBER", "numeric": "NUMBER",
        "date": "DATE", "time": "TIME",
        "timestamp": "TIMESTAMP_TZ", "timestamp_tz": "TIMESTAMP_TZ",
        "timestamp_ntz": "TIMESTAMP_NTZ", "bytes": "BINARY",
        "object": "OBJECT", "record": "OBJECT", "struct": "OBJECT", "array": "ARRAY",
    },
    "mysql": {
        "string": "VARCHAR", "text": "VARCHAR", "varchar": "VARCHAR",
        "boolean": "TINYINT(1)", "float": "DOUBLE", "double": "DOUBLE",
        "int": "INT", "integer": "INT", "long": "BIGINT", "bigint": "BIGINT",
        "number": "DECIMAL", "decimal": "DECIMAL", "numeric": "DECIMAL",
        "date": "DATE", "time": "TIME",
        "timestamp": "TIMESTAMP", "timestamp_tz": "TIMESTAMP", "timestamp_ntz": "DATETIME",
        "bytes": "BLOB", "object": "JSON", "record": "JSON", "struct": "JSON",
        "null": "NULL",
    },
    "databricks": {
        "string": "STRING", "text": "STRING", "varchar": "STRING",
        "boolean": "BOOLEAN", "float": "FLOAT", "double": "DOUBLE",
        "int": "INT", "integer": "INT", "long": "BIGINT", "bigint": "BIGINT",
        "date": "DATE", "time": "STRING",
        "timestamp": "TIMESTAMP", "timestamp_tz": "TIMESTAMP",
        "timestamp_ntz": "TIMESTAMP_NTZ", "bytes": "BINARY", "null": "NULL",
    },
    "sqlserver": {
        "string": "nvarchar", "text": "nvarchar", "varchar": "nvarchar",
        "boolean": "bit", "float": "float", "double": "float",
        "int": "int", "integer": "int", "long": "bigint", "bigint": "bigint",
        "date": "date", "time": "time",
        "timestamp": "datetimeoffset", "timestamp_tz": "datetimeoffset",
        "timestamp_ntz": "datetime2", "bytes": "varbinary",
        "object": "nvarchar(max)", "record": "nvarchar(max)", "struct": "nvarchar(max)",
    },
    "bigquery": {
        "string": "STRING", "text": "STRING", "varchar": "STRING",
        "boolean": "BOOL", "float": "FLOAT64", "double": "FLOAT64",
        "int": "INT64", "integer": "INT64", "long": "INT64", "bigint": "INT64",
        "number": "NUMERIC", "decimal": "NUMERIC", "numeric": "NUMERIC",
        "date": "DATE", "time": "TIME",
        "timestamp": "TIMESTAMP", "timestamp_tz": "TIMESTAMP", "timestamp_ntz": "DATETIME",
        "bytes": "BYTES",
    },
}


def sql_type(field: Optional[Field], dialect: str = "duckdb") -> Optional[str]:
    """Logical contract type → physical SQL type for ``dialect``."""
    if field is None or field.type is None:
        return None
    override = field.config.get(f"{dialect}Type") if field.config else None
    if override:
        return override
    t = field.type.lower()
    table = _SIMPLE.get(dialect, _SIMPLE["duckdb"])
    if t in table:
        base = table[t]
        if dialect == "mysql" and t in ("string", "text", "varchar") and field.maxLength:
            return f"VARCHAR({field.maxLength})"
        return base
    if t in ("number", "decimal", "numeric"):
        if field.precision is not None:
            return f"DECIMAL({field.precision},{field.scale or 0})"
        return "DECIMAL"
    if t in ("array",):
        if dialect == "postgres":
            inner = sql_type(field.items, dialect) or "text"
            return f"{inner}[]"
        if dialect in ("databricks", "bigquery"):
            inner = sql_type(field.items, dialect) or "STRING"
            return f"ARRAY<{inner}>"
        inner = sql_type(field.items, dialect) or "VARCHAR"
        return f"{inner}[]"
    if t in ("object", "record", "struct"):
        if dialect in ("databricks", "bigquery"):
            parts = [f"{_quote_ident(n, dialect)} {sql_type(f, dialect)}"
                     for n, f in field.fields.items()]
            return f"STRUCT<{', '.join(parts)}>"
        parts = [f"{_quote_ident(n, dialect)} {sql_type(f, dialect)}"
                 for n, f in field.fields.items()]
        return f"STRUCT({', '.join(parts)})"
    if t == "map":
        k = sql_type(field.keys, dialect) or "VARCHAR"
        v = sql_type(field.values, dialect) or "VARCHAR"
        return f"MAP({k}, {v})"
    return None


_SERVER_DIALECTS = ("snowflake", "postgres", "mysql", "databricks", "sqlserver", "bigquery")


def to_sql_ddl(spec: DataContractSpecification, dialect: Optional[str] = None,
               server: Optional[str] = None) -> str:
    """CREATE TABLE DDL for every model (≅ sql_converter.to_sql_ddl)."""
    servers = spec.servers
    if server is not None:
        servers = {server: spec.servers[server]}
    table_prefix = ""
    if dialect is None:
        dialect = "duckdb"
        for _, srv in servers.items():
            if srv.type in _SERVER_DIALECTS:
                dialect = srv.type
                if srv.type == "databricks":
                    cat = srv.config.get("catalog")
                    sch = srv.config.get("schema")
                    if cat and sch:
                        table_prefix = f"{cat}.{sch}."
                break

    out = [f"-- Data Contract: {spec.id}", f"-- SQL Dialect: {dialect}"]
    for model_name, model in spec.models.items():
        out.append(_table_ddl(table_prefix + model_name, model, dialect))
    return "\n".join(out).strip()


def _escape(text: Optional[str]) -> Optional[str]:
    return None if text is None else text.replace('"', '\\"')


# SQL words that cannot appear as a BARE column name (duckdb_keywords()
# categories 'reserved' + 'type_function' — the PostgreSQL-lineage set
# shared by the dialects here; every word was verified unparseable as an
# unquoted column): identifiers matching one of these, or containing
# non-identifier characters, are quoted so the emitted DDL stays parseable
# (a contract field may legally be named "as" or "is").
_RESERVED = frozenset((
    'all', 'analyse', 'analyze', 'and', 'anti', 'any', 'array', 'as',
    'asc', 'asof', 'asymmetric', 'authorization', 'binary', 'both',
    'case', 'cast', 'check', 'collate', 'collation', 'column', 'columns',
    'concurrently', 'constraint', 'create', 'cross', 'default',
    'deferrable', 'desc', 'describe', 'distinct', 'do', 'else', 'end',
    'except', 'false', 'fetch', 'for', 'foreign', 'freeze', 'from',
    'full', 'generated', 'glob', 'grant', 'group', 'having', 'ilike',
    'in', 'initially', 'inner', 'intersect', 'into', 'is', 'isnull',
    'join', 'lateral', 'leading', 'left', 'like', 'limit', 'map',
    'natural', 'not', 'notnull', 'null', 'offset', 'on', 'only', 'or',
    'order', 'outer', 'overlaps', 'pivot', 'pivot_longer', 'pivot_wider',
    'placing', 'positional', 'primary', 'qualify', 'references',
    'returning', 'right', 'select', 'semi', 'show', 'similar', 'some',
    'struct', 'summarize', 'symmetric', 'table', 'tablesample', 'then',
    'to', 'trailing', 'true', 'try_cast', 'union', 'unique', 'unpivot',
    'using', 'variadic', 'verbose', 'when', 'where', 'window', 'with',
))

_IDENT_RE = None


def _quote_ident(name: str, dialect: str) -> str:
    """Quote ``name`` only when required (reserved word or non-identifier
    characters) so golden outputs for ordinary names are unchanged."""
    global _IDENT_RE
    if _IDENT_RE is None:
        import re
        _IDENT_RE = re.compile(r"^[A-Za-z_][A-Za-z0-9_]*$")
    if _IDENT_RE.match(name) and name.lower() not in _RESERVED:
        return name
    if dialect in ("mysql", "databricks", "bigquery"):
        return "`" + name.replace("`", "``") + "`"
    if dialect == "sqlserver":
        return "[" + name.replace("]", "]]") + "]"
    return '"' + name.replace('"', '""') + '"'


def _table_ddl(name: str, model: Model, dialect: str) -> str:
    create = "CREATE OR REPLACE TABLE" if dialect == "databricks" else "CREATE TABLE"
    # quote every dotted segment (catalog.schema.table) — a schema
    # literally named "order" must quote too
    name = ".".join(_quote_ident(seg, dialect) for seg in name.split("."))
    lines = [f"{create} {name} ("]
    cols = []
    for fname, f in model.fields.items():
        col = f"  {_quote_ident(fname, dialect)} {sql_type(f, dialect)}"
        if f.required:
            col += " not null"
        if f.primaryKey:
            col += " primary key"
        if dialect == "databricks" and f.description is not None:
            col += f' COMMENT "{_escape(f.description)}"'
        cols.append(col)
    body = ",\n".join(cols)
    tail = ")"
    if dialect == "databricks" and model.description is not None:
        tail += f' COMMENT "{_escape(model.description)}"'
    return f"{lines[0]}\n{body}\n{tail};"


def to_sql_query(spec: DataContractSpecification, model_name: str,
                 dialect: str = "duckdb") -> str:
    """Column-list SELECT for one model (≅ sql_converter.to_sql_query)."""
    model = spec.models[model_name]
    out = [f"-- Data Contract: {spec.id}", f"-- SQL Dialect: {dialect}", "select"]
    names = list(model.fields.keys())
    for i, n in enumerate(names):
        out.append(f"    {_quote_ident(n, dialect)}"
                   + ("," if i < len(names) - 1 else ""))
    out.append(f"from {_quote_ident(model_name, dialect)}")
    return "\n".join(out) + "\n"

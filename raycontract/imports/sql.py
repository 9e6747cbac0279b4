"""SQL DDL → contract importer.

≅ the reference's ``imports/sql_importer.py`` (sqlglot-based): same output —
one model per CREATE TABLE, field types mapped back to contract logical
types, NOT NULL → required, PRIMARY KEY → primaryKey, VARCHAR(n) →
maxLength, DECIMAL(p,s) → precision/scale.

sqlglot is unavailable offline, so parsing is delegated to DuckDB itself:
the DDL is executed against an in-memory connection (after a light
dialect-normalization pre-pass) and the catalog is introspected via
``duckdb_columns()`` / ``duckdb_constraints()``. DuckDB accepts
ANSI/postgres-flavored DDL, which covers the round-trip with
:mod:`raycontract.export.sql`.
"""

from __future__ import annotations

import re
from typing import Optional

from raycontract.contract import DataContractSpecification, Field, Info, Model, Server

# physical → logical (inverse of export/sql.py's duckdb/postgres maps; DuckDB
# normalizes most aliases before we see them)
_TYPE_MAP = {
    "VARCHAR": "string", "TEXT": "string", "CHAR": "string", "BPCHAR": "string",
    "STRING": "string", "NVARCHAR": "string",
    "BOOLEAN": "boolean", "BIT": "boolean", "TINYINT(1)": "boolean",
    "FLOAT": "float", "REAL": "float", "FLOAT4": "float",
    "DOUBLE": "double", "FLOAT8": "double", "DOUBLE PRECISION": "double",
    "TINYINT": "int", "SMALLINT": "int", "INTEGER": "int", "INT": "int", "INT4": "int",
    "BIGINT": "long", "INT8": "long", "HUGEINT": "long",
    "DATE": "date", "TIME": "time",
    "TIMESTAMP WITH TIME ZONE": "timestamp", "TIMESTAMPTZ": "timestamp",
    "TIMESTAMP": "timestamp_ntz", "DATETIME": "timestamp_ntz", "DATETIME2": "timestamp_ntz",
    "BLOB": "bytes", "BYTEA": "bytes", "BINARY": "bytes", "VARBINARY": "bytes",
    "JSON": "object", "JSONB": "object",
}

_DECIMAL_RE = re.compile(r"^(?:DECIMAL|NUMERIC|NUMBER)\s*\(\s*(\d+)\s*,\s*(\d+)\s*\)$",
                         re.IGNORECASE)
_VARCHAR_N_RE = re.compile(r"^(?:VARCHAR|NVARCHAR|CHAR)\s*\(\s*(\d+)\s*\)$", re.IGNORECASE)


def map_sql_type(sql_type: str) -> tuple[Optional[str], dict]:
    """physical SQL type string → (logical type, extra field attrs)."""
    s = sql_type.strip()
    up = s.upper()
    m = _DECIMAL_RE.match(up)
    if m:
        return "decimal", {"precision": int(m.group(1)), "scale": int(m.group(2))}
    m = _VARCHAR_N_RE.match(up)
    if m:
        return "string", {"maxLength": int(m.group(1))}
    if up.endswith("[]"):
        inner, extra = map_sql_type(up[:-2])
        item = Field(type=inner)
        for k, v in extra.items():
            setattr(item, k, v)
        return "array", {"items": item}
    if up.startswith("STRUCT(") or up.startswith("STRUCT<"):
        return "object", {}
    if up.startswith("MAP("):
        return "map", {}
    if up in ("DECIMAL", "NUMERIC", "NUMBER"):
        return "decimal", {}
    return _TYPE_MAP.get(up), {}


def _normalize_ddl(sql: str) -> str:
    """Light dialect normalization so DuckDB can execute the statement:
    strip backticks, COMMENT clauses, dialect-only keywords."""
    out = sql.replace("`", '"')
    out = re.sub(r'\s+COMMENT\s+"(?:[^"\\]|\\.)*"', "", out)
    out = re.sub(r"\s+COMMENT\s+'(?:[^'\\]|\\.)*'", "", out)
    out = re.sub(r"\bCREATE\s+OR\s+REPLACE\s+TABLE\b", "CREATE TABLE", out,
                 flags=re.IGNORECASE)
    # databricks/bigquery nested generics → duckdb syntax
    out = re.sub(r"\bARRAY<([^<>]+)>", r"\1[]", out)
    out = re.sub(r"\bSTRUCT<([^<>]*)>", r"STRUCT(\1)", out)
    out = re.sub(r"\bDATETIME2?\b", "TIMESTAMP", out, flags=re.IGNORECASE)
    out = re.sub(r"\bdatetimeoffset\b", "TIMESTAMP WITH TIME ZONE", out, flags=re.IGNORECASE)
    out = re.sub(r"\bTIMESTAMP_NTZ\b", "TIMESTAMP", out, flags=re.IGNORECASE)
    out = re.sub(r"\bTIMESTAMP_TZ\b", "TIMESTAMP WITH TIME ZONE", out, flags=re.IGNORECASE)
    out = re.sub(r"\bTINYINT\(1\)\b", "BOOLEAN", out, flags=re.IGNORECASE)
    out = re.sub(r"\bNUMBER\b(?!\s*\()", "DECIMAL(38,0)", out, flags=re.IGNORECASE)
    out = re.sub(r"\bFLOAT64\b", "DOUBLE", out, flags=re.IGNORECASE)
    out = re.sub(r"\bINT64\b", "BIGINT", out, flags=re.IGNORECASE)
    out = re.sub(r"\bBOOL\b", "BOOLEAN", out, flags=re.IGNORECASE)
    out = re.sub(r"\bBYTES\b", "BLOB", out, flags=re.IGNORECASE)
    return out


_CREATE_TABLE_RE = re.compile(r"^\s*CREATE\s+TABLE\b", re.IGNORECASE)


def _create_table_statements(sql: str) -> list[str]:
    """Split the script on statement-level semicolons (quote-aware) and keep
    only CREATE TABLE statements — CTAS (``CREATE TABLE .. AS SELECT``) is
    also rejected since its SELECT body can reference external readers."""
    stmts, buf, quote = [], [], None
    for ch in sql:
        if quote:
            buf.append(ch)
            if ch == quote:
                quote = None
        elif ch in ("'", '"'):
            quote = ch
            buf.append(ch)
        elif ch == ";":
            stmts.append("".join(buf))
            buf = []
        else:
            buf.append(ch)
    stmts.append("".join(buf))
    out = []
    for s in stmts:
        if not s.strip():
            continue
        if _CREATE_TABLE_RE.match(s) and not re.search(
                r"\)\s*AS\b|\bAS\s+SELECT\b", s, re.IGNORECASE):
            out.append(s)
    return out


def import_sql(source: str, dialect: Optional[str] = None) -> DataContractSpecification:
    """``source`` is a path to a .sql file or the DDL text itself."""
    import os

    import duckdb

    sql = source
    if os.path.exists(source):
        with open(source) as fh:
            sql = fh.read()
    # drop comment lines (incl. our exporter's header)
    sql = "\n".join(l for l in sql.splitlines() if not l.strip().startswith("--"))

    # The reference importer PARSES the DDL (sqlglot, no execution); executing
    # a third-party .sql file must not gain side effects here, so (a) the
    # connection is opened with external access disabled — COPY TO, ATTACH,
    # INSTALL/LOAD and read_csv()/read_parquet() of local paths all raise —
    # and (b) the script is pre-filtered to CREATE TABLE statements only.
    con = duckdb.connect(config={"enable_external_access": False})
    try:
        for stmt in _create_table_statements(_normalize_ddl(sql)):
            con.execute(stmt)
    except Exception as e:
        raise ValueError(f"cannot parse SQL DDL: {e}") from e

    spec = DataContractSpecification()
    spec.dataContractSpecification = "1.1.0"
    spec.id = "imported-sql"
    spec.info = Info(title="Imported SQL DDL", version="0.0.1")
    if dialect:
        spec.servers[dialect] = Server(type=dialect)

    cols = con.execute(
        "SELECT table_name, column_name, data_type, is_nullable FROM duckdb_columns() "
        "WHERE NOT internal ORDER BY table_name, column_index").fetchall()
    pk_cols: set[tuple[str, str]] = set()
    for (tname, ctext) in con.execute(
            "SELECT table_name, constraint_column_names FROM duckdb_constraints() "
            "WHERE constraint_type = 'PRIMARY KEY'").fetchall():
        for c in ctext:
            pk_cols.add((tname, c))
    con.close()

    for tname, cname, dtype, nullable in cols:
        model = spec.models.setdefault(tname, Model())
        logical, extra = map_sql_type(dtype)
        f = Field(type=logical)
        for k, v in extra.items():
            setattr(f, k, v)
        if str(nullable).upper() in ("NO", "FALSE", "0"):
            f.required = True
        if (tname, cname) in pk_cols:
            f.primaryKey = True
            f.required = True
        f.config["physicalType"] = dtype
        model.fields[cname] = f
    return spec

"""Data-contract specification model + YAML resolver.

Faithful subset of the reference contract model
(``datacontract/model/data_contract_specification.py:52-320`` in
datacontract-cli): ``DataContractSpecification`` → ``models: {name: Model}`` →
``fields: {name: Field}`` with the constraint surface the checks consume
(type, required, unique, references, pattern, min/maxLength, minimum/maximum,
exclusiveMinimum/exclusiveMaximum, enum, format, precision/scale, nested
fields/items, per-field quality, config), plus ``servers``, ``servicelevels``
(freshness/retention) and the deprecated root ``quality``. Resolution mirrors
``lint/resolve.py:21-44`` (YAML → dict → model) and ``resolve.py:75-191``
(local ``#/definitions`` ``$ref`` inlining).

Plain dataclasses; parsed once on the driver. The contract never ships to
workers — only compiled check plans do.
"""

from __future__ import annotations

from dataclasses import dataclass, field as dc_field
from typing import Any, Optional

import yaml

# Logical types accepted by the contract (reference
# data_contract_specification.py:7-31 DATACONTRACT_TYPES, + time/map accepted
# by its converters, export/sql_type_converter.py:277,293-299).
DATACONTRACT_TYPES = [
    "string", "text", "varchar",
    "number", "decimal", "numeric",
    "int", "integer",
    "long", "bigint",
    "float", "double",
    "boolean",
    "timestamp", "timestamp_tz", "timestamp_ntz",
    "date", "time",
    "array", "map", "bytes",
    "object", "record", "struct",
    "null",
]


@dataclass
class Quality:
    """Reference data_contract_specification.py:124-143."""

    type: Optional[str] = None  # only "sql" is executed (ref data_contract_checks.py:455)
    description: Optional[str] = None
    query: Optional[str] = None
    mustBe: Any = None
    mustNotBe: Any = None
    mustBeGreaterThan: Optional[float] = None
    mustBeGreaterThanOrEqualTo: Optional[float] = None
    mustBeLessThan: Optional[float] = None
    mustBeLessThanOrEqualTo: Optional[float] = None
    mustBeBetween: Optional[list[float]] = None
    mustNotBeBetween: Optional[list[float]] = None

    @staticmethod
    def from_dict(d: dict) -> "Quality":
        return Quality(**{k: d.get(k) for k in Quality.__dataclass_fields__ if k in d})


@dataclass
class Field:
    """Reference data_contract_specification.py:145-187."""

    type: Optional[str] = None
    title: Optional[str] = None
    description: Optional[str] = None
    required: Optional[bool] = None
    unique: Optional[bool] = None
    references: Optional[str] = None  # "model.field"
    format: Optional[str] = None  # uuid | email | uri
    pattern: Optional[str] = None
    minLength: Optional[int] = None
    maxLength: Optional[int] = None
    minimum: Optional[float] = None
    maximum: Optional[float] = None
    exclusiveMinimum: Optional[float] = None
    exclusiveMaximum: Optional[float] = None
    enum: Optional[list] = None
    precision: Optional[int] = None
    scale: Optional[int] = None
    primaryKey: Optional[bool] = None
    pii: Optional[bool] = None
    classification: Optional[str] = None
    tags: Optional[list] = None
    example: Any = None
    examples: Optional[list] = None
    fields: dict[str, "Field"] = dc_field(default_factory=dict)  # struct children
    items: Optional["Field"] = None  # array element
    keys: Optional["Field"] = None  # map key
    values: Optional["Field"] = None  # map value
    quality: list[Quality] = dc_field(default_factory=list)
    config: dict[str, Any] = dc_field(default_factory=dict)

    @staticmethod
    def from_dict(d: dict) -> "Field":
        f = Field()
        for k, v in d.items():
            if k == "fields" and isinstance(v, dict):
                f.fields = {n: Field.from_dict(fd or {}) for n, fd in v.items()}
            elif k == "items" and isinstance(v, dict):
                f.items = Field.from_dict(v)
            elif k == "keys" and isinstance(v, dict):
                f.keys = Field.from_dict(v)
            elif k == "values" and isinstance(v, dict):
                f.values = Field.from_dict(v)
            elif k == "quality" and isinstance(v, list):
                f.quality = [Quality.from_dict(q) for q in v]
            elif k in Field.__dataclass_fields__:
                setattr(f, k, v)
            # unknown keys ignored (forward compat, like pydantic's default)
        return f


@dataclass
class Model:
    """Reference data_contract_specification.py:190-204."""

    type: Optional[str] = "table"
    title: Optional[str] = None
    description: Optional[str] = None
    fields: dict[str, Field] = dc_field(default_factory=dict)
    primaryKey: list[str] = dc_field(default_factory=list)
    quality: list[Quality] = dc_field(default_factory=list)
    config: dict[str, Any] = dc_field(default_factory=dict)

    @staticmethod
    def from_dict(d: dict) -> "Model":
        m = Model()
        for k, v in d.items():
            if k == "fields" and isinstance(v, dict):
                m.fields = {n: Field.from_dict(fd or {}) for n, fd in v.items()}
            elif k == "quality" and isinstance(v, list):
                m.quality = [Quality.from_dict(q) for q in v]
            elif k in Model.__dataclass_fields__:
                setattr(m, k, v)
        return m


@dataclass
class Server:
    """Reference data_contract_specification.py:52-80."""

    type: Optional[str] = None  # local | s3 | ... | dataframe
    format: Optional[str] = None  # parquet | json | csv | delta | lance
    path: Optional[str] = None
    location: Optional[str] = None
    account: Optional[str] = None  # warehouse/catalog account (glue CatalogId)
    database: Optional[str] = None
    delimiter: Optional[str] = None  # for json: new_line | array
    dataProductId: Optional[str] = None
    config: dict[str, Any] = dc_field(default_factory=dict)

    @staticmethod
    def from_dict(d: dict) -> "Server":
        s = Server()
        for k, v in d.items():
            if k in Server.__dataclass_fields__:
                setattr(s, k, v)
            else:
                s.config[k] = v
        return s


@dataclass
class Freshness:
    """Reference data_contract_specification.py:252-255."""

    threshold: Optional[str] = None  # e.g. "24h", "PT24H"
    timestampField: Optional[str] = None


@dataclass
class Retention:
    """Reference data_contract_specification.py:238-242."""

    period: Optional[str] = None  # e.g. "P1Y", "30d"
    timestampField: Optional[str] = None
    unlimited: Optional[bool] = None


@dataclass
class ServiceLevel:
    """Reference data_contract_specification.py:279-287 (checked subset)."""

    freshness: Optional[Freshness] = None
    retention: Optional[Retention] = None

    @staticmethod
    def from_dict(d: dict) -> "ServiceLevel":
        sl = ServiceLevel()
        if isinstance(d.get("freshness"), dict):
            fd = d["freshness"]
            sl.freshness = Freshness(fd.get("threshold"), fd.get("timestampField"))
        if isinstance(d.get("retention"), dict):
            rd = d["retention"]
            sl.retention = Retention(rd.get("period"), rd.get("timestampField"), rd.get("unlimited"))
        return sl


@dataclass
class Info:
    title: Optional[str] = None
    version: Optional[str] = None
    description: Optional[str] = None


@dataclass
class DataContractSpecification:
    """Reference data_contract_specification.py:289-307."""

    dataContractSpecification: Optional[str] = None
    id: Optional[str] = None
    info: Info = dc_field(default_factory=Info)
    terms: dict[str, Any] = dc_field(default_factory=dict)  # usage/limitations/noticePeriod…
    servers: dict[str, Server] = dc_field(default_factory=dict)
    models: dict[str, Model] = dc_field(default_factory=dict)
    definitions: dict[str, Field] = dc_field(default_factory=dict)
    servicelevels: Optional[ServiceLevel] = None
    quality: Optional[dict] = None  # deprecated root quality (SodaCL passthrough subset)

    @staticmethod
    def from_dict(d: dict, validate: bool = False,
                  base_dir: Optional[str] = None,
                  base_url: Optional[str] = None) -> "DataContractSpecification":
        if validate:
            # JSON-Schema-shaped structural gate BEFORE hydration
            # (≅ reference lint/resolve.py:283-305; the reference applies it
            # at resolve time inside test/lint, not in the spec class — same
            # here: DataContract.test()/lint() validate, from_dict is lazy)
            from raycontract.schema_validate import validate_contract_dict

            validate_contract_dict(d)
        d = _inline_refs(d, base_dir=base_dir, base_url=base_url)
        spec = DataContractSpecification()
        spec.dataContractSpecification = d.get("dataContractSpecification")
        spec.id = d.get("id")
        info = d.get("info") or {}
        spec.info = Info(info.get("title"), info.get("version"), info.get("description"))
        spec.terms = d.get("terms") or {}
        spec.servers = {n: Server.from_dict(s or {}) for n, s in (d.get("servers") or {}).items()}
        spec.models = {n: Model.from_dict(m or {}) for n, m in (d.get("models") or {}).items()}
        spec.definitions = {n: Field.from_dict(f or {}) for n, f in (d.get("definitions") or {}).items()}
        if isinstance(d.get("servicelevels"), dict):
            spec.servicelevels = ServiceLevel.from_dict(d["servicelevels"])
        q = d.get("quality")
        if isinstance(q, dict):
            spec.quality = q.get("specification") if "specification" in q else q
        return spec

    @staticmethod
    def from_string(text: str, validate: bool = False,
                    base_dir: Optional[str] = None,
                    base_url: Optional[str] = None) -> "DataContractSpecification":
        d = yaml.safe_load(text)
        # ODCS v3 auto-detect ≅ reference resolve.py:248-252
        if isinstance(d, dict):
            from raycontract.imports.odcs import import_odcs_from_dict, is_odcs

            if is_odcs(d):
                return import_odcs_from_dict(d)
        return DataContractSpecification.from_dict(d, validate=validate,
                                                   base_dir=base_dir, base_url=base_url)

    @staticmethod
    def from_file(path: str, validate: bool = False) -> "DataContractSpecification":
        import os

        with open(path) as fh:
            return DataContractSpecification.from_string(
                fh.read(), validate=validate,
                base_dir=os.path.dirname(os.path.abspath(path)))


def fetch_url(url: str, timeout: float = 10.0) -> str:
    """GET a contract / definition document over http(s) — ≅ the reference's
    ``lint/urls.py:1-60`` (fetch_resource). stdlib urllib so tests can
    monkeypatch ``urllib.request.urlopen``; the sandbox has no network, so
    every call either hits a test mock or raises loudly."""
    import urllib.request

    req = urllib.request.Request(url, headers={"User-Agent": "raycontract"})
    with urllib.request.urlopen(req, timeout=timeout) as resp:
        return resp.read().decode("utf-8")


def _inline_refs(d: dict, base_dir: Optional[str] = None,
                 base_url: Optional[str] = None) -> dict:
    """Inline ``$ref`` definitions (reference resolve.py:75-191): local
    ``#/definitions/...`` pointers, file refs — ``file://...#/ptr``,
    relative or absolute ``path.yaml#/ptr`` resolved against ``base_dir``
    (the contract file's directory) — and ``http(s)://`` refs fetched via
    :func:`fetch_url` (relative refs resolve against ``base_url`` when the
    contract itself came from a URL)."""
    import os

    defs = d.get("definitions") or {}
    file_cache: dict[str, Any] = {}

    def _load_file(path: str):
        from urllib.parse import urljoin

        if path.startswith(("http://", "https://")):
            pass  # absolute URL
        elif path.startswith("file://"):
            path = path[len("file://"):]
        elif not os.path.isabs(path) and base_url is not None:
            path = urljoin(base_url, path)
        elif not os.path.isabs(path):
            if base_dir is None:
                raise ValueError(
                    f"relative file $ref {path!r} needs a contract file location")
            path = os.path.join(base_dir, path)
        if path not in file_cache:
            if path.startswith(("http://", "https://")):
                file_cache[path] = yaml.safe_load(fetch_url(path))
            else:
                with open(path) as fh:
                    file_cache[path] = yaml.safe_load(fh)
        return file_cache[path]

    def _pointer(doc, ptr: str, ref: str):
        target = doc
        for part in ptr.strip("/").split("/"):
            if not part:
                continue
            if not isinstance(target, dict) or part not in target:
                raise ValueError(f"unresolved $ref: {ref}")
            target = target[part]
        return target

    def resolve(node, depth=0):
        if depth > 32:
            raise ValueError("$ref nesting too deep (cycle?)")
        if isinstance(node, dict):
            if "$ref" in node:
                ref = node["$ref"]
                if ref.startswith("#/definitions/"):
                    target = defs
                    for part in ref[len("#/definitions/"):].split("/"):
                        if part not in target:
                            raise ValueError(f"unresolved $ref: {ref}")
                        target = target[part]
                elif ("#" in ref or ref.startswith(("file://", "http://", "https://"))
                        or ref.endswith((".yaml", ".yml", ".json"))):
                    path, _, ptr = ref.partition("#")
                    doc = _load_file(path)
                    target = _pointer(doc, ptr, ref) if ptr else doc
                else:
                    raise ValueError(f"unsupported $ref: {ref}")
                merged = dict(resolve(target, depth + 1))
                merged.update({k: v for k, v in node.items() if k != "$ref"})
                return merged
            return {k: resolve(v, depth + 1) for k, v in node.items()}
        if isinstance(node, list):
            return [resolve(v, depth + 1) for v in node]
        return node

    return resolve(d)


class DataContract:
    """Facade ≅ reference ``datacontract/data_contract.py`` (test/lint entry).

    ``test()`` lives in :mod:`raycontract.engine`; this class carries the
    resolved spec + server selection.
    """

    def __init__(
        self,
        data_contract_file: Optional[str] = None,
        data_contract_str: Optional[str] = None,
        data_contract: Optional[DataContractSpecification] = None,
        server: Optional[str] = None,
    ):
        self.raw_dict: Optional[dict] = None  # kept for schema validation at
        #                                       test()/lint() time (≅ resolve)
        if data_contract is not None:
            self.spec = data_contract
        elif data_contract_str is not None:
            d = yaml.safe_load(data_contract_str)
            if isinstance(d, dict):
                self.raw_dict = d
            self.spec = DataContractSpecification.from_string(data_contract_str)
        elif data_contract_file is not None:
            import os

            if data_contract_file.startswith(("http://", "https://")):
                # remote contract (reference lint/urls.py: `datacontract test
                # https://...`); relative $refs resolve against the URL
                text = fetch_url(data_contract_file)
                d = yaml.safe_load(text)
                if isinstance(d, dict):
                    self.raw_dict = d
                self.spec = DataContractSpecification.from_string(
                    text, base_url=data_contract_file)
            else:
                with open(data_contract_file) as fh:
                    text = fh.read()
                d = yaml.safe_load(text)
                if isinstance(d, dict):
                    self.raw_dict = d
                self.spec = DataContractSpecification.from_string(
                    text, base_dir=os.path.dirname(os.path.abspath(data_contract_file)))
        else:
            raise ValueError("one of data_contract_file/str/spec required")
        self.server_name = server

    def validate_schema(self) -> None:
        """Raise ContractValidationError if the raw document violates the DCS
        structural schema (no-op for programmatically built specs)."""
        if self.raw_dict is not None:
            from raycontract.imports.odcs import is_odcs
            from raycontract.schema_validate import validate_contract_dict

            if not is_odcs(self.raw_dict):
                validate_contract_dict(self.raw_dict)

    def get_server(self) -> Optional[Server]:
        """First server or the named one (ref engines/data_contract_test.py:35-47)."""
        if not self.spec.servers:
            return None
        if self.server_name:
            if self.server_name not in self.spec.servers:
                raise ValueError(f"server {self.server_name!r} not in contract")
            return self.spec.servers[self.server_name]
        return next(iter(self.spec.servers.values()))

    def test(self, **kwargs):
        from raycontract.engine import validate

        return validate(self, **kwargs)

    def lint(self):
        from raycontract.lint import lint_spec

        return lint_spec(self.spec, raw_dict=self.raw_dict)

"""Generic row-wise JSON-Schema engine.

The reference validates ``format: json`` servers by compiling the contract to
a JSON Schema and running fastjsonschema row by row
(``engines/fastjsonschema/check_jsonschema.py:87-111``), producing one
violation per bad row with the primary-key value in the reason and a global
error cap (``DATACONTRACT_MAX_ERRORS``, ``:51-84``).

raycontract's default JSON path executes contract-derived constraints as
vectorized Arrow kernels (``stages/stats.py``) — far faster, but bounded to
the contract surface. This module is the *generic* interpreter for arbitrary
JSON Schemas (draft-07 keyword set incl. combinators and ``$ref``), so
schemas that go beyond what a contract can express still validate.

Scale shape: the schema compiles ONCE per actor into a closure tree
(``JsonRowValidator.__init__``); rows stream through an actor-pool
``map_batches`` and only violation rows leave the workers. Per-row Python is
inherent to arbitrary-schema validation (the reference pays the same cost via
fastjsonschema); the driver never materializes the input.
"""

from __future__ import annotations

import re
from typing import Any, Callable, Optional

import pyarrow as pa

# error sink: list of (path, message); validators return True when valid
_Validator = Callable[[Any, str, list, bool], bool]

_FORMAT_RE = {
    "uuid": re.compile(r"^[0-9a-fA-F]{8}-[0-9a-fA-F]{4}-[0-9a-fA-F]{4}"
                       r"-[0-9a-fA-F]{4}-[0-9a-fA-F]{12}$"),
    "email": re.compile(r"^[^@\s]+@[^@\s]+\.[^@\s]+$"),
    "uri": re.compile(r"^\w+:(\/?\/?)[^\s]+$"),
    "hostname": re.compile(
        r"^(([a-zA-Z0-9]|[a-zA-Z0-9][a-zA-Z0-9\-]{0,61}[a-zA-Z0-9])\.)*"
        r"([A-Za-z0-9]|[A-Za-z0-9][A-Za-z0-9\-]{0,61}[A-Za-z0-9])$"),
    "ipv4": re.compile(r"^((25[0-5]|2[0-4]\d|1?\d?\d)\.){3}"
                       r"(25[0-5]|2[0-4]\d|1?\d?\d)$"),
    "ipv6": re.compile(r"^[0-9a-fA-F:]+$"),
    "date": re.compile(r"^\d{4}-\d{2}-\d{2}$"),
    "time": re.compile(r"^\d{2}:\d{2}:\d{2}(\.\d+)?([zZ]|[+-]\d{2}:\d{2})?$"),
    "date-time": re.compile(
        r"^\d{4}-\d{2}-\d{2}[tT ]\d{2}:\d{2}:\d{2}(\.\d+)?"
        r"([zZ]|[+-]\d{2}:\d{2})?$"),
}

_TYPE_CHECK = {
    "string": lambda v: isinstance(v, str),
    "number": lambda v: isinstance(v, (int, float)) and not isinstance(v, bool),
    "integer": lambda v: (isinstance(v, int) and not isinstance(v, bool))
    or (isinstance(v, float) and v.is_integer()),
    "boolean": lambda v: isinstance(v, bool),
    "object": lambda v: isinstance(v, dict),
    "array": lambda v: isinstance(v, (list, tuple)),
    "null": lambda v: v is None,
}


def _resolve_ref(ref: str, root: dict) -> dict:
    if not ref.startswith("#"):
        raise ValueError(f"only intra-document $refs are supported, got {ref!r}")
    node: Any = root
    for part in ref.lstrip("#/").split("/"):
        if part:
            node = node[part.replace("~1", "/").replace("~0", "~")]
    return node


def compile_jsonschema(schema: Any, root: Optional[dict] = None) -> Callable[[Any], list]:
    """Compile a JSON Schema (draft-07 keyword surface) into a validator
    closure. The returned callable takes one decoded JSON value and returns
    ``[(path, message), ...]`` — empty when valid. fastjsonschema-style
    messages and ``data.x[0].y`` paths (divergences: error *collection*
    instead of raise-on-first; combinator messages are summarized)."""
    if root is None:
        root = schema if isinstance(schema, dict) else {}
    node = _compile(schema, root, depth=0)

    def validate(value: Any, first: bool = False) -> list:
        errors: list = []
        node(value, "data", errors, first)
        return errors

    return validate


def _compile(schema: Any, root: dict, depth: int) -> _Validator:
    if depth > 64:
        raise ValueError("schema nesting deeper than 64 (recursive $ref?)")
    if schema is True or schema == {}:
        return lambda v, p, errs, first: True
    if schema is False:
        return lambda v, p, errs, first: (errs.append((p, f"{p} must not be there")), False)[1]
    if not isinstance(schema, dict):
        raise ValueError(f"schema node must be bool or object, got {type(schema)}")
    if "$ref" in schema:
        target = _resolve_ref(schema["$ref"], root)
        # lazy body so self-referential schemas compile (cycle guarded at
        # validation depth, not compile depth)
        inner: list = []

        def ref_check(v, p, errs, first, _t=target, _r=root, _d=depth):
            if not inner:
                inner.append(_compile(_t, _r, _d + 1))
            return inner[0](v, p, errs, first)

        return ref_check

    checks: list[_Validator] = []

    if "type" in schema:
        types = schema["type"] if isinstance(schema["type"], list) else [schema["type"]]
        preds = [_TYPE_CHECK[t] for t in types]
        label = " or ".join(types)

        def type_check(v, p, errs, first, _preds=preds, _label=label):
            if any(pr(v) for pr in _preds):
                return True
            errs.append((p, f"{p} must be {_label}"))
            return False

        checks.append(type_check)

    if "enum" in schema:
        allowed = list(schema["enum"])

        def enum_check(v, p, errs, first, _a=allowed):
            # JSON equality: true is not 1 — bool/int compare equal in
            # Python, so the type split is checked explicitly
            for a in _a:
                if isinstance(a, bool) == isinstance(v, bool) and v == a:
                    return True
            errs.append((p, f"{p} must be one of {_a!r}"))
            return False

        checks.append(enum_check)

    if "const" in schema:
        cval = schema["const"]

        def const_check(v, p, errs, first, _c=cval):
            if v == _c and isinstance(_c, bool) == isinstance(v, bool):
                return True
            errs.append((p, f"{p} must be same as const definition: {_c!r}"))
            return False

        checks.append(const_check)

    # ---- string keywords (apply only to str values, per spec)
    if "pattern" in schema:
        rx = re.compile(schema["pattern"])

        def pattern_check(v, p, errs, first, _rx=rx, _pat=schema["pattern"]):
            if isinstance(v, str) and _rx.search(v) is None:
                errs.append((p, f"{p} must match pattern {_pat}"))
                return False
            return True

        checks.append(pattern_check)

    if "format" in schema and schema["format"] in _FORMAT_RE:
        frx = _FORMAT_RE[schema["format"]]

        def format_check(v, p, errs, first, _rx=frx, _f=schema["format"]):
            if isinstance(v, str) and _rx.match(v) is None:
                errs.append((p, f"{p} must be {_f}"))
                return False
            return True

        checks.append(format_check)

    for kw, op, msg in (("minLength", lambda n, lim: n >= lim,
                         "must be longer than or equal to {} characters"),
                        ("maxLength", lambda n, lim: n <= lim,
                         "must be shorter than or equal to {} characters")):
        if kw in schema:
            lim = schema[kw]

            def len_check(v, p, errs, first, _op=op, _lim=lim, _msg=msg):
                if isinstance(v, str) and not _op(len(v), _lim):
                    errs.append((p, f"{p} " + _msg.format(_lim)))
                    return False
                return True

            checks.append(len_check)

    # ---- numeric keywords. Draft-07 numeric exclusiveMinimum/Maximum are
    # INDEPENDENT keywords — a schema may carry both minimum AND
    # exclusiveMinimum and a value must satisfy each; draft-04 boolean
    # exclusives only modify minimum/maximum. So each present keyword emits
    # its own check instead of the exclusive form overwriting lo/hi.
    lo_bounds: list[tuple[float, bool]] = []
    hi_bounds: list[tuple[float, bool]] = []
    if schema.get("minimum") is not None:
        lo_bounds.append((schema["minimum"],
                          schema.get("exclusiveMinimum") is True))
    if "exclusiveMinimum" in schema and not isinstance(
            schema["exclusiveMinimum"], bool):
        lo_bounds.append((schema["exclusiveMinimum"], True))
    if schema.get("maximum") is not None:
        hi_bounds.append((schema["maximum"],
                          schema.get("exclusiveMaximum") is True))
    if "exclusiveMaximum" in schema and not isinstance(
            schema["exclusiveMaximum"], bool):
        hi_bounds.append((schema["exclusiveMaximum"], True))
    for lo, lo_excl in lo_bounds:
        def min_check(v, p, errs, first, _lo=lo, _ex=lo_excl):
            if isinstance(v, (int, float)) and not isinstance(v, bool):
                if (v <= _lo) if _ex else (v < _lo):
                    word = "bigger than" if _ex else "bigger than or equal to"
                    errs.append((p, f"{p} must be {word} {_lo}"))
                    return False
            return True

        checks.append(min_check)
    for hi, hi_excl in hi_bounds:
        def max_check(v, p, errs, first, _hi=hi, _ex=hi_excl):
            if isinstance(v, (int, float)) and not isinstance(v, bool):
                if (v >= _hi) if _ex else (v > _hi):
                    word = "smaller than" if _ex else "smaller than or equal to"
                    errs.append((p, f"{p} must be {word} {_hi}"))
                    return False
            return True

        checks.append(max_check)
    if "multipleOf" in schema:
        mult = schema["multipleOf"]

        def mult_check(v, p, errs, first, _m=mult):
            if isinstance(v, (int, float)) and not isinstance(v, bool):
                q = v / _m
                if abs(q - round(q)) > 1e-9:
                    errs.append((p, f"{p} must be multiple of {_m}"))
                    return False
            return True

        checks.append(mult_check)

    # ---- object keywords
    if isinstance(schema.get("required"), list) and schema["required"]:
        req = tuple(schema["required"])

        def required_check(v, p, errs, first, _req=req):
            if isinstance(v, dict):
                missing = [k for k in _req if k not in v]
                if missing:
                    errs.append((p, f"{p} must contain {missing!r} properties"))
                    return False
            return True

        checks.append(required_check)

    props = {k: _compile(s, root, depth + 1)
             for k, s in schema.get("properties", {}).items()}
    pattern_props = [(re.compile(k), _compile(s, root, depth + 1))
                     for k, s in schema.get("patternProperties", {}).items()]
    addl = schema.get("additionalProperties")
    addl_node = _compile(addl, root, depth + 1) if isinstance(addl, dict) else None
    if props or pattern_props or addl is not None:
        known = frozenset(schema.get("properties", {}))

        def props_check(v, p, errs, first, _props=props, _pp=pattern_props,
                        _known=known, _addl=addl, _addl_node=addl_node):
            if not isinstance(v, dict):
                return True
            ok = True
            for k, val in v.items():
                kp = f"{p}.{k}"
                matched = False
                if k in _props:
                    matched = True
                    if not _props[k](val, kp, errs, first):
                        ok = False
                        if first:
                            return False
                for rx, node in _pp:
                    if rx.search(k):
                        matched = True
                        if not node(val, kp, errs, first):
                            ok = False
                            if first:
                                return False
                if not matched:
                    if _addl is False:
                        errs.append((kp, f"{kp} must not be there"))
                        ok = False
                        if first:
                            return False
                    elif _addl_node is not None:
                        if not _addl_node(val, kp, errs, first):
                            ok = False
                            if first:
                                return False
            return ok

        checks.append(props_check)

    for kw, op, msg in (("minProperties", lambda n, lim: n >= lim,
                         "must contain at least {} properties"),
                        ("maxProperties", lambda n, lim: n <= lim,
                         "must contain at most {} properties")):
        if kw in schema:
            lim = schema[kw]

            def nprops_check(v, p, errs, first, _op=op, _lim=lim, _msg=msg):
                if isinstance(v, dict) and not _op(len(v), _lim):
                    errs.append((p, f"{p} " + _msg.format(_lim)))
                    return False
                return True

            checks.append(nprops_check)

    # ---- array keywords
    items = schema.get("items")
    if items is not None:
        if isinstance(items, list):  # positional (draft-07 tuple form)
            tuple_nodes = [_compile(s, root, depth + 1) for s in items]
            rest = schema.get("additionalItems")
            rest_node = _compile(rest, root, depth + 1) if isinstance(rest, dict) else None

            def tuple_check(v, p, errs, first, _nodes=tuple_nodes,
                            _rest=rest, _rest_node=rest_node):
                if not isinstance(v, (list, tuple)):
                    return True
                ok = True
                for i, val in enumerate(v):
                    ip = f"{p}[{i}]"
                    if i < len(_nodes):
                        if not _nodes[i](val, ip, errs, first):
                            ok = False
                    elif _rest is False:
                        errs.append((ip, f"{ip} must not be there"))
                        ok = False
                    elif _rest_node is not None and not _rest_node(val, ip, errs, first):
                        ok = False
                    if not ok and first:
                        return False
                return ok

            checks.append(tuple_check)
        else:
            item_node = _compile(items, root, depth + 1)

            def items_check(v, p, errs, first, _node=item_node):
                if not isinstance(v, (list, tuple)):
                    return True
                ok = True
                for i, val in enumerate(v):
                    if not _node(val, f"{p}[{i}]", errs, first):
                        ok = False
                        if first:
                            return False
                return ok

            checks.append(items_check)

    if "contains" in schema:
        contains_node = _compile(schema["contains"], root, depth + 1)

        def contains_check(v, p, errs, first, _node=contains_node):
            if isinstance(v, (list, tuple)):
                if not any(_node(val, p, [], True) for val in v):
                    errs.append((p, f"{p} must contain at least one defined item"))
                    return False
            return True

        checks.append(contains_check)

    for kw, op, msg in (("minItems", lambda n, lim: n >= lim,
                         "must contain at least {} items"),
                        ("maxItems", lambda n, lim: n <= lim,
                         "must contain at most {} items")):
        if kw in schema:
            lim = schema[kw]

            def nitems_check(v, p, errs, first, _op=op, _lim=lim, _msg=msg):
                if isinstance(v, (list, tuple)) and not _op(len(v), _lim):
                    errs.append((p, f"{p} " + _msg.format(_lim)))
                    return False
                return True

            checks.append(nitems_check)

    if schema.get("uniqueItems") is True:
        def unique_check(v, p, errs, first):
            if isinstance(v, (list, tuple)):
                seen = []
                for val in v:
                    if val in seen:
                        errs.append((p, f"{p} must contain unique items"))
                        return False
                    seen.append(val)
            return True

        checks.append(unique_check)

    # ---- combinators
    for kw in ("allOf",):
        if kw in schema:
            sub = [_compile(s, root, depth + 1) for s in schema[kw]]

            def allof_check(v, p, errs, first, _sub=sub):
                ok = True
                for node in _sub:
                    if not node(v, p, errs, first):
                        ok = False
                        if first:
                            return False
                return ok

            checks.append(allof_check)
    if "anyOf" in schema:
        any_sub = [_compile(s, root, depth + 1) for s in schema["anyOf"]]

        def anyof_check(v, p, errs, first, _sub=any_sub):
            if any(node(v, p, [], True) for node in _sub):
                return True
            errs.append((p, f"{p} must be valid by one of anyOf definition"))
            return False

        checks.append(anyof_check)
    if "oneOf" in schema:
        one_sub = [_compile(s, root, depth + 1) for s in schema["oneOf"]]

        def oneof_check(v, p, errs, first, _sub=one_sub):
            n = sum(1 for node in _sub if node(v, p, [], True))
            if n == 1:
                return True
            errs.append((p, f"{p} must be valid exactly by one of oneOf definition"
                            f" (matched {n})"))
            return False

        checks.append(oneof_check)
    if "not" in schema:
        not_node = _compile(schema["not"], root, depth + 1)

        def not_check(v, p, errs, first, _node=not_node):
            if _node(v, p, [], True):
                errs.append((p, f"{p} must NOT be valid by not definition"))
                return False
            return True

        checks.append(not_check)
    if "if" in schema:
        if_node = _compile(schema["if"], root, depth + 1)
        then_node = _compile(schema["then"], root, depth + 1) if "then" in schema else None
        else_node = _compile(schema["else"], root, depth + 1) if "else" in schema else None

        def cond_check(v, p, errs, first, _i=if_node, _t=then_node, _e=else_node):
            branch = _t if _i(v, p, [], True) else _e
            return branch(v, p, errs, first) if branch is not None else True

        checks.append(cond_check)

    if not checks:
        return lambda v, p, errs, first: True
    if len(checks) == 1:
        return checks[0]

    def run_all(v, p, errs, first, _checks=tuple(checks)):
        ok = True
        for c in _checks:
            if not c(v, p, errs, first):
                ok = False
                if first:
                    return False
        return ok

    return run_all


def primary_key_field(schema: dict) -> Optional[str]:
    """First property flagged ``primaryKey`` (reference
    ``check_jsonschema.py:21-38``, sans the thread-local cache — the compiled
    validator is per-actor state here)."""
    for name, attrs in schema.get("properties", {}).items():
        if isinstance(attrs, dict) and attrs.get("primaryKey"):
            return name
    return None


class JsonRowValidator:
    """Actor-pool stage: compile the schema once per actor, stream batches,
    emit only violation rows ``(pk, path, message, reason)``."""

    def __init__(self, schema: dict, model_name: str = "model",
                 pk: Optional[str] = None, collect: str = "first"):
        self.validate = compile_jsonschema(schema)
        self.model = model_name
        self.pk = pk or primary_key_field(schema)
        self.first = collect == "first"

    def __call__(self, batch: pa.Table) -> pa.Table:
        pks, paths, msgs, reasons = [], [], [], []
        for row in batch.to_pylist():
            errors = self.validate(row, first=self.first)
            pkv = row.get(self.pk) if self.pk else None
            for path, msg in errors:
                pks.append(None if pkv is None else str(pkv))
                paths.append(path)
                msgs.append(msg)
                # reference reason format: "#{pk}: {message}"
                reasons.append(f"#{pkv}: {msg}" if pkv is not None else msg)
        return pa.table({
            "model": pa.array([self.model] * len(paths), type=pa.string()),
            "pk": pa.array(pks, type=pa.string()),
            "path": pa.array(paths, type=pa.string()),
            "message": pa.array(msgs, type=pa.string()),
            "reason": pa.array(reasons, type=pa.string()),
        })


def validate_json_rows(ds, schema: dict, model_name: str = "model",
                       pk: Optional[str] = None, max_errors: Optional[int] = None,
                       collect: str = "first", concurrency=None):
    """Validate every row of ``ds`` against an arbitrary JSON Schema.

    Returns a Dataset of violation rows (empty = all valid). ``max_errors``
    mirrors ``DATACONTRACT_MAX_ERRORS`` (reference ``check_jsonschema.py:51-84``)
    as a streaming ``limit`` — with early-stop, not a full scan + truncate;
    at web scale "which 500" is block-order-dependent, documented divergence
    from the reference's strict first-500 (its input is a single file).
    ``collect='all'`` reports every violated keyword per row instead of the
    reference's first-error-per-row."""
    out = ds.map_batches(
        JsonRowValidator,
        fn_constructor_kwargs={"schema": schema, "model_name": model_name,
                               "pk": pk, "collect": collect},
        batch_format="pyarrow",
        concurrency=concurrency or (1, 8),
        # max_restarts=0 (ray#53727): constructor args live in the object
        # store; a restart after losing them cannot succeed anyway.
        max_restarts=0,
    )
    if max_errors is not None:
        out = out.limit(max_errors)
    return out

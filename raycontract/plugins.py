"""User-extension surface: register custom check kinds.

≅ the reference's extension hooks (SQL quality checks as the UDF surface,
``engines/data_contract_checks.py:450-496``, plus its importer/exporter
factory registries, ``exporter_factory.py:12-28``) — re-expressed
Arrow-native per SURVEY.md §2e: ``register_check(kind, mask_fn)`` adds a new
vectorized constraint kind that the single-pass StatsKernel evaluates exactly
like the built-ins (same violation counting, NULL semantics under the
caller's control, same samples/diagnostics plumbing).

``mask_fn(column: pa.ChunkedArray, args: tuple) -> BooleanArray`` returns the
INVALID mask (nulls in the mask are ignored by the counter, matching the
missing/invalid split). The registry is a module-level dict captured when a
kernel is constructed — register before calling validate(); kernels ship the
resolved function to Ray workers, so it must either live in a module the
workers can import, or be a closure/lambda (cloudpickle serializes those by
value).

Contracts opt in per field via config::

    fields:
      price:
        type: double
        config:
          checks:
            - kind: my_custom_kind
              args: [42]
"""

from __future__ import annotations

from typing import Callable

_REGISTRY: dict[str, Callable] = {}


def register_check(kind: str, mask_fn: Callable) -> None:
    """Register (or replace) a custom constraint kind."""
    if not kind or not isinstance(kind, str):
        raise ValueError("kind must be a non-empty string")
    _REGISTRY[kind] = mask_fn


def unregister_check(kind: str) -> None:
    _REGISTRY.pop(kind, None)


def get_check(kind: str):
    return _REGISTRY.get(kind)


def registered_kinds() -> list[str]:
    return sorted(_REGISTRY)

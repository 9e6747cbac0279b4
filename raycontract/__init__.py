"""raycontract — a Ray-Data-native data-contract validation engine.

Re-expresses the capabilities of datacontract-cli (schema + constraint +
quality validation of tabular data against a contract YAML) as streaming
Ray Data pipelines over zero-copy Arrow batches.

Semantics reference (studied, not copied): /root/reference (datacontract-cli
v0.10.23); see SURVEY.md for the full operator mapping.
"""


def _settle_fsspec_http() -> None:
    """Ray's path resolution does ``from fsspec.implementations.http import
    HTTPFileSystem`` guarded only by ModuleNotFoundError. Offline (no
    aiohttp), that module import fails every time — and when the first-ever
    read happens on concurrent threads, the retried import surfaces as a
    bare ImportError that Ray does NOT catch. Pre-install a sentinel module
    once, on the main thread: Ray's isinstance check then simply returns
    False, which is the correct answer for every non-HTTP filesystem."""
    try:
        from fsspec.implementations.http import HTTPFileSystem  # noqa: F401
    except Exception:
        import sys as _sys
        import types as _types

        mod = _types.ModuleType("fsspec.implementations.http")

        class HTTPFileSystem:  # sentinel: nothing instantiates it offline
            pass

        mod.HTTPFileSystem = HTTPFileSystem
        _sys.modules["fsspec.implementations.http"] = mod


_settle_fsspec_http()

from raycontract.result import Check, ResultEnum, Run
from raycontract.contract import DataContract, DataContractSpecification
from raycontract.engine import validate
from raycontract.stages.jsonrows import compile_jsonschema, validate_json_rows

__all__ = ["Check", "ResultEnum", "Run", "DataContract",
           "DataContractSpecification", "validate",
           "compile_jsonschema", "validate_json_rows"]
__version__ = "0.2.0"

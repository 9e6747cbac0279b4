"""raycontract — a Ray-Data-native data-contract validation engine.

Re-expresses the capabilities of datacontract-cli (schema + constraint +
quality validation of tabular data against a contract YAML) as streaming
Ray Data pipelines over zero-copy Arrow batches.

Semantics reference (studied, not copied): /root/reference (datacontract-cli
v0.10.23); see SURVEY.md for the full operator mapping.
"""

from raycontract.result import Check, ResultEnum, Run
from raycontract.contract import DataContract
from raycontract.engine import validate

__all__ = ["Check", "ResultEnum", "Run", "DataContract", "validate"]
__version__ = "0.1.0"

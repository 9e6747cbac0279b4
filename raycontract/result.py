"""Run / Check result model.

Mirrors the reference's result model (datacontract-cli
``datacontract/model/run.py:10-110``): the same ``ResultEnum`` values, the
same ``Check`` shape (id/key/category/type/name/model/field/engine/result/
reason/details/diagnostics) and the same run-verdict precedence
(error > failed > warning > passed > unknown, ``run.py:65-75``), so verdicts
from this engine are 1:1 comparable with the reference CLI's output.

Implemented with plain dataclasses (no pydantic needed on the hot path; the
result model never crosses into Ray workers — it is assembled on the driver
from reduced per-partition stats).
"""

from __future__ import annotations

import dataclasses
import enum
import json
import uuid
from dataclasses import dataclass, field as dc_field
from datetime import datetime, timezone
from typing import Any, Optional


class ResultEnum(str, enum.Enum):
    passed = "passed"
    warning = "warning"
    failed = "failed"
    error = "error"
    info = "info"
    unknown = "unknown"


@dataclass
class Check:
    type: str
    id: Optional[str] = None
    key: Optional[str] = None
    category: Optional[str] = None
    name: Optional[str] = None
    model: Optional[str] = None
    field: Optional[str] = None

    engine: Optional[str] = "raycontract"
    language: Optional[str] = None
    implementation: Optional[str] = None

    result: Optional[ResultEnum] = None
    reason: Optional[str] = None
    details: Optional[str] = None
    diagnostics: Optional[dict] = None

    def to_dict(self) -> dict[str, Any]:
        d = dataclasses.asdict(self)
        if isinstance(d.get("result"), ResultEnum):
            d["result"] = d["result"].value
        return d


@dataclass
class Log:
    level: str
    message: str
    timestamp: datetime


@dataclass
class Run:
    runId: str
    dataContractId: Optional[str] = None
    dataContractVersion: Optional[str] = None
    server: Optional[str] = None
    timestampStart: Optional[datetime] = None
    timestampEnd: Optional[datetime] = None
    result: ResultEnum = ResultEnum.unknown
    checks: list[Check] = dc_field(default_factory=list)
    logs: list[Log] = dc_field(default_factory=list)
    # per-execution-unit metrics (label → {seconds, ...}); populated by the
    # engine so every run ships its own stage timings (north-rule 'metrics')
    metrics: dict = dc_field(default_factory=dict)

    @staticmethod
    def create_run() -> "Run":
        now = datetime.now(timezone.utc)
        return Run(runId=str(uuid.uuid4()), timestampStart=now, timestampEnd=now)

    def has_passed(self) -> bool:
        self.calculate_result()
        return self.result == ResultEnum.passed

    def finish(self) -> None:
        self.timestampEnd = datetime.now(timezone.utc)
        self.calculate_result()

    def calculate_result(self) -> None:
        # verdict precedence identical to reference model/run.py:65-75
        if any(c.result == ResultEnum.error for c in self.checks):
            self.result = ResultEnum.error
        elif any(c.result == ResultEnum.failed for c in self.checks):
            self.result = ResultEnum.failed
        elif any(c.result == ResultEnum.warning for c in self.checks):
            self.result = ResultEnum.warning
        elif any(c.result == ResultEnum.passed for c in self.checks):
            self.result = ResultEnum.passed
        else:
            self.result = ResultEnum.unknown

    def log_info(self, message: str) -> None:
        self.logs.append(Log("INFO", message, datetime.now(timezone.utc)))

    def log_warn(self, message: str) -> None:
        self.logs.append(Log("WARN", message, datetime.now(timezone.utc)))

    def log_error(self, message: str) -> None:
        self.logs.append(Log("ERROR", message, datetime.now(timezone.utc)))

    def pretty(self) -> str:
        return json.dumps(
            {
                "runId": self.runId,
                "dataContractId": self.dataContractId,
                "result": self.result.value,
                "checks": [c.to_dict() for c in self.checks],
            },
            indent=2,
            default=str,
        )

    def to_table_rows(self) -> list[dict[str, Any]]:
        """Flatten checks for a tabular report (parquet sink / CLI table)."""
        rows = []
        for c in self.checks:
            rows.append(
                {
                    "key": c.key,
                    "category": c.category,
                    "type": c.type,
                    "name": c.name,
                    "model": c.model,
                    "field": c.field,
                    "result": c.result.value if c.result else None,
                    "reason": c.reason,
                    "violations": int((c.diagnostics or {}).get("invalid_count", 0) or 0),
                }
            )
        return rows


def new_check_id() -> str:
    return str(uuid.uuid4())

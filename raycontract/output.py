"""Result sinks: console table, JUnit XML, Parquet.

≅ the reference's output layer: rich-table console report + exit code
(``output/test_results_writer.py:13-57``) and JUnit XML
(``output/junit_test_results.py:10-84``), re-implemented plainly (no rich in
this environment), plus a Parquet sink for verdicts so downstream pipelines
can consume check results as data.
"""

from __future__ import annotations

import xml.etree.ElementTree as ET
from datetime import timezone

from raycontract.result import ResultEnum, Run


def console_table(run: Run) -> str:
    rows = run.to_table_rows()
    cols = ["result", "key", "field", "violations", "reason"]
    widths = {c: len(c) for c in cols}
    printable = []
    for r in rows:
        line = {
            "result": r["result"] or "unknown",
            "key": r["key"] or "",
            "field": r["field"] or "",
            "violations": str(r["violations"]),
            "reason": (r["reason"] or "")[:60],
        }
        printable.append(line)
        for c in cols:
            widths[c] = max(widths[c], len(line[c]))
    sep = "  "
    out = [sep.join(c.ljust(widths[c]) for c in cols),
           sep.join("-" * widths[c] for c in cols)]
    out.extend(sep.join(line[c].ljust(widths[c]) for c in cols) for line in printable)
    dur = ""
    if run.timestampStart and run.timestampEnd:
        dur = f" in {(run.timestampEnd - run.timestampStart).total_seconds():.2f}s"
    out.append(f"\nResult: {run.result.value}{dur} ({len(rows)} checks)")
    return "\n".join(out)


def junit_xml(run: Run) -> str:
    """JUnit XML: one testcase per check (shape mirrors junit_test_results.py)."""
    checks = run.checks
    failures = sum(1 for c in checks if c.result == ResultEnum.failed)
    errors = sum(1 for c in checks if c.result == ResultEnum.error)
    suite = ET.Element("testsuite", {
        "name": f"datacontract {run.dataContractId or ''}".strip(),
        "tests": str(len(checks)),
        "failures": str(failures),
        "errors": str(errors),
        "timestamp": (run.timestampStart.astimezone(timezone.utc).isoformat()
                      if run.timestampStart else ""),
    })
    for c in checks:
        tc = ET.SubElement(suite, "testcase", {
            "name": c.key or c.type,
            "classname": f"{c.model or ''}.{c.field or ''}".strip("."),
        })
        if c.result == ResultEnum.failed:
            f = ET.SubElement(tc, "failure", {"message": c.reason or "failed"})
            f.text = str(c.diagnostics or "")
        elif c.result == ResultEnum.error:
            e = ET.SubElement(tc, "error", {"message": c.reason or "error"})
            e.text = str(c.diagnostics or "")
        elif c.result not in (ResultEnum.passed, None):
            ET.SubElement(tc, "skipped", {"message": c.result.value if c.result else "unknown"})
    return ET.tostring(suite, encoding="unicode", xml_declaration=True)


def write_violations_parquet(run: Run, path: str) -> None:
    """Violation rows across all failed checks: (check_key, pk, value, reason).

    Row caps come from validate(max_samples=...) — the reference caps at 500
    via DATACONTRACT_MAX_ERRORS (check_jsonschema.py:51-84); pass
    max_samples=500 for the same convention. Samples never carry wide
    payloads (image bytes are summarized as '<N bytes>')."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    keys, pks, values, reasons = [], [], [], []
    for c in run.checks:
        d = c.diagnostics or {}
        for s in d.get("samples", []):
            if isinstance(s, (tuple, list)) and len(s) == 2:
                pk, val = s
            else:
                pk, val = None, s
            keys.append(c.key)
            pks.append(str(pk) if pk is not None else None)
            values.append(str(val) if val is not None else None)
            reasons.append(c.reason)
    pq.write_table(pa.table({
        "check_key": pa.array(keys, type=pa.string()),
        "pk": pa.array(pks, type=pa.string()),
        "value": pa.array(values, type=pa.string()),
        "reason": pa.array(reasons, type=pa.string()),
    }), path)


def write_results_parquet(run: Run, path: str) -> None:
    import pyarrow as pa
    import pyarrow.parquet as pq

    rows = run.to_table_rows()
    cols = {k: [r[k] for r in rows] for k in
            ("key", "category", "type", "name", "model", "field", "result", "reason",
             "violations")}
    t = pa.table({
        **{k: pa.array(v, type=pa.string()) for k, v in cols.items() if k != "violations"},
        "violations": pa.array(cols["violations"], type=pa.int64()),
    })
    pq.write_table(t, path)


def run_to_json(run: Run) -> str:
    """Run → the reference's publish payload shape (``integration/
    datamesh_manager.py:8-44`` POSTs the Run as JSON; offline, the same
    document is written to a file via :func:`publish_run`)."""
    import dataclasses
    import json
    from datetime import datetime
    from enum import Enum

    def default(o):
        if isinstance(o, datetime):
            return o.isoformat()
        if isinstance(o, Enum):
            return o.value
        if dataclasses.is_dataclass(o):
            return dataclasses.asdict(o)
        return str(o)

    import dataclasses as _dc

    doc = _dc.asdict(run)
    return json.dumps(doc, default=default, indent=2)


def publish_run(run: Run, path: str) -> None:
    """File-sink analog of the reference's HTTP publish (network is
    unavailable offline): write the Run JSON atomically."""
    import os
    import tempfile

    d = os.path.dirname(os.path.abspath(path))
    os.makedirs(d, exist_ok=True)
    fd, tmp = tempfile.mkstemp(dir=d, suffix=".tmp")
    try:
        with os.fdopen(fd, "w") as fh:
            fh.write(run_to_json(run))
        os.replace(tmp, path)
    except BaseException:
        if os.path.exists(tmp):
            os.unlink(tmp)
        raise

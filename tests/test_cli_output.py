import os
import tempfile

import pyarrow as pa

from raycontract import DataContract
from raycontract.output import console_table, junit_xml, write_results_parquet

CONTRACT = """
id: c
models:
  m:
    fields:
      a: {type: long, required: true, maximum: 5}
"""


def _run(ray_session):
    t = pa.table({"a": pa.array([1, 2, 10], type=pa.int64())})
    return DataContract(data_contract_str=CONTRACT).test(datasets={"m": t})


def test_console_table(ray_session):
    run = _run(ray_session)
    out = console_table(run)
    assert "m__a__field_maximum" in out and "failed" in out
    assert "Result: failed" in out


def test_junit_xml(ray_session):
    import xml.etree.ElementTree as ET

    run = _run(ray_session)
    root = ET.fromstring(junit_xml(run))
    assert root.tag == "testsuite"
    assert root.attrib["failures"] == "1"
    cases = {tc.attrib["name"]: tc for tc in root}
    assert cases["m__a__field_maximum"].find("failure") is not None


def test_results_parquet(ray_session):
    import pyarrow.parquet as pq

    run = _run(ray_session)
    path = os.path.join(tempfile.mkdtemp(), "r.parquet")
    write_results_parquet(run, path)
    t = pq.read_table(path)
    assert t.num_rows == len(run.checks)
    byk = {k: v for k, v in zip(t["key"].to_pylist(), t["violations"].to_pylist())}
    assert byk["m__a__field_maximum"] == 1


def test_cli_main_lint(tmp_path):
    from raycontract.cli import main

    f = tmp_path / "c.yaml"
    f.write_text(CONTRACT)
    assert main(["lint", str(f)]) == 0

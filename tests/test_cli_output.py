import os
import tempfile

import pyarrow as pa

from raycontract import DataContract
from raycontract.output import console_table, junit_xml, write_results_parquet

CONTRACT = """
id: c
dataContractSpecification: 1.1.0
info: {title: test, version: 1.0.0}
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


def test_violations_full_extraction(ray_session, tmp_path):
    import duckdb
    import pyarrow as pa

    import ray.data as rd

    from raycontract.compile import compile_contract
    from raycontract.contract import DataContractSpecification
    from raycontract.stages.violations import extract_violations

    spec = DataContractSpecification.from_string("""
id: v
dataContractSpecification: 1.1.0
info: {title: test, version: 1.0.0}
models:
  m:
    primaryKey: [id]
    fields:
      id: {type: string, required: true}
      v: {type: long, maximum: 10, minimum: 0}
      s: {type: string, pattern: "^[a-z]+$"}
""")
    plan = compile_contract(spec, None).models["m"]
    t = pa.table({"id": pa.array([f"r{i}" for i in range(100)]),
                  "v": pa.array([i - 5 for i in range(100)], type=pa.int64()),
                  "s": pa.array(["ok"] * 50 + ["BAD"] * 50)})
    out = extract_violations(rd.from_arrow(t), plan).to_pandas()
    # oracle: 5 below minimum + 84 above maximum + 50 regex
    by = out.groupby("check_key").size().to_dict()
    con = duckdb.connect()
    con.register("t", t)
    assert by["m__v__field_minimum"] == con.execute("SELECT count(*) FROM t WHERE v < 0").fetchone()[0]
    assert by["m__v__field_maximum"] == con.execute("SELECT count(*) FROM t WHERE v > 10").fetchone()[0]
    assert by["m__s__field_regex"] == 50
    # every violation row carries the pk
    assert out["pk"].notna().all()
    # parquet sink path
    n = extract_violations(rd.from_arrow(t), plan, str(tmp_path / "viol"))
    assert n == len(out)


def test_publish_run_json(ray_session, tmp_path):
    """File-sink analog of the reference's HTTP publish (r2)."""
    import json

    from raycontract.output import publish_run

    run = _run(ray_session)
    out = tmp_path / "nested" / "run.json"
    publish_run(run, str(out))
    doc = json.loads(out.read_text())
    assert doc["runId"] == run.runId
    assert doc["result"] == run.result.value
    assert len(doc["checks"]) == len(run.checks)
    assert all("key" in c and "result" in c for c in doc["checks"])


def test_extract_clean_and_nested_violations(ray_session, tmp_path):
    """Clean-row sink (inverse of extract_violations) incl. nested-path
    masks (r2): rows with struct/list violations drop as a whole."""
    import pyarrow.parquet as pq
    import ray.data as rd

    from raycontract.compile import compile_contract
    from raycontract.contract import DataContractSpecification
    from raycontract.stages.violations import extract_clean, extract_violations

    contract = """
dataContractSpecification: 1.1.0
id: clean
info: {title: t, version: 1.0.0}
models:
  m:
    primaryKey: [id]
    fields:
      id: {type: long, required: true}
      v: {type: long, minimum: 0}
      addr:
        type: object
        fields:
          zip: {type: string, pattern: "^[0-9]{5}$"}
      scores:
        type: array
        items: {type: long, maximum: 100}
"""
    t = pa.table({
        "id": pa.array([1, 2, 3, 4], type=pa.int64()),
        "v": pa.array([5, -1, 7, 8], type=pa.int64()),          # row 2 dirty
        "addr": pa.array([{"zip": "12345"}, {"zip": "11111"},
                          {"zip": "bad"}, {"zip": "22222"}],     # row 3 dirty
                         type=pa.struct([pa.field("zip", pa.string())])),
        "scores": pa.array([[1, 2], [3], [4], [999]],            # row 4 dirty
                           type=pa.list_(pa.int64())),
    })
    spec = DataContractSpecification.from_string(contract)
    plan = compile_contract(spec, None)
    mp = plan.models["m"]

    clean = extract_clean(rd.from_arrow(t), mp)
    kept = sorted(r["id"] for r in clean.take_all())
    assert kept == [1]  # rows 2/3/4 each violate one constraint

    viols = extract_violations(rd.from_arrow(t), mp).take_all()
    by_key = {}
    for r in viols:
        by_key.setdefault(r["check_key"], []).append(r["pk"])
    assert by_key["m__v__field_minimum"] == ["2"]
    assert by_key["m__addr.zip__field_regex"] == ["3"]   # nested pk mapping
    assert by_key["m__scores[]__field_maximum"] == ["4"]


def test_extract_clean_hive_partitioned(ray_session, tmp_path):
    import os

    import pyarrow as pa

    import ray.data as rd

    from raycontract.compile import compile_contract
    from raycontract.contract import DataContractSpecification
    from raycontract.stages.violations import extract_clean

    yaml = """
dataContractSpecification: 1.1.0
id: docs
info: {title: docs, version: 1.0.0}
models:
  documents:
    fields:
      doc_id: {type: long, required: true}
      lang: {type: string, enum: [en, de]}
"""
    spec = DataContractSpecification.from_string(yaml)
    mp = compile_contract(spec, None).models["documents"]
    t = pa.table({"doc_id": pa.array([1, 2, 3, None], pa.int64()),
                  "lang": ["en", "de", "en", "en"]})
    out = str(tmp_path / "clean")
    n = extract_clean(rd.from_arrow(t), mp, out_dir=out,
                      partition_cols=["lang"])
    assert n == 3  # the null doc_id row is dirty
    dirs = sorted(d for d in os.listdir(out) if d.startswith("lang="))
    assert dirs == ["lang=de", "lang=en"]  # hive layout → prunable reads
    back = rd.read_parquet(os.path.join(out, "lang=en")).count()
    assert back == 2


def test_cli_publish_file_target(tmp_path, ray_session):
    """`publish` writes the resolved ($ref-inlined) contract JSON to a file
    target (reference cli.py:328-349 posts it to the Data Mesh Manager;
    http(s) targets POST the same body)."""
    import json

    from raycontract.cli import main
    from raycontract.fixtures import IMAGES_CONTRACT_YAML

    c = tmp_path / "c.yaml"
    c.write_text(IMAGES_CONTRACT_YAML)
    out = tmp_path / "published.json"
    rc = main(["publish", str(c), "--target", str(out)])
    assert rc == 0
    d = json.loads(out.read_text())
    assert "models" in d and "info" in d

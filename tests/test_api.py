"""REST API (stdlib http.server analog of the reference's FastAPI api.py)."""

import json
import threading
import urllib.error
import urllib.request

import pytest

from raycontract.api import serve

CONTRACT = """
dataContractSpecification: 1.1.0
id: api-test
info: {title: t, version: 1.0.0}
models:
  m:
    fields:
      a: {type: long, required: true}
"""


@pytest.fixture()
def api_server():
    httpd = serve(0)  # ephemeral port
    t = threading.Thread(target=httpd.serve_forever, daemon=True)
    t.start()
    yield f"http://127.0.0.1:{httpd.server_address[1]}"
    httpd.shutdown()
    httpd.server_close()


def _post(url: str, body: str, headers=None):
    req = urllib.request.Request(url, data=body.encode(), method="POST",
                                 headers=headers or {})
    with urllib.request.urlopen(req, timeout=30) as r:
        return r.status, json.loads(r.read())


def test_lint_endpoint(api_server):
    status, doc = _post(api_server + "/lint", CONTRACT)
    assert status == 200
    assert doc["result"] in ("passed", "warning")
    assert any(c["key"] == "lint__schema" for c in doc["checks"])


def test_export_endpoint(api_server):
    status, doc = _post(api_server + "/export?format=sql", CONTRACT)
    assert status == 200
    assert "CREATE TABLE m" in doc["result"]


def test_test_endpoint_runs_checks(api_server, ray_session):
    import os
    import tempfile

    import pyarrow as pa
    import pyarrow.parquet as pq

    d = tempfile.mkdtemp()
    pq.write_table(pa.table({"a": pa.array([1, None], type=pa.int64())}),
                   os.path.join(d, "m.parquet"))
    contract = CONTRACT + f"""
servers:
  local: {{type: local, format: parquet, path: "{d}/{{model}}.parquet"}}
"""
    status, doc = _post(api_server + "/test", contract)
    assert status == 200
    assert doc["result"] == "failed"  # planted null in a required field
    by = {c["key"]: c for c in doc["checks"]}
    assert by["m__a__field_required"]["result"] == "failed"


def test_malformed_contract_is_422(api_server):
    with pytest.raises(urllib.error.HTTPError) as ei:
        _post(api_server + "/export?format=sql", "models: [broken")
    assert ei.value.code == 422


def test_api_key_auth(api_server, monkeypatch):
    monkeypatch.setenv("RAYCONTRACT_API_KEY", "sekret")
    with pytest.raises(urllib.error.HTTPError) as ei:
        _post(api_server + "/lint", CONTRACT)
    assert ei.value.code == 401
    # wrong key is indistinguishable from missing key (single 401, ADVICE r2)
    with pytest.raises(urllib.error.HTTPError) as ei:
        _post(api_server + "/lint", CONTRACT, headers={"x-api-key": "wrong"})
    assert ei.value.code == 401
    status, _ = _post(api_server + "/lint", CONTRACT, headers={"x-api-key": "sekret"})
    assert status == 200

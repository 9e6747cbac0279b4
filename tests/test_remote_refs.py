"""http(s) contract + $ref resolution (VERDICT r2 next-step #6) — urllib is
monkeypatched; no network is touched (none exists in the sandbox)."""

import io
import urllib.request

import pytest

REMOTE_CONTRACT = """
dataContractSpecification: 1.1.0
id: remote-c
info: {title: remote, version: 1.0.0}
models:
  m:
    fields:
      order_id:
        $ref: 'definitions.yaml#/order_id'
      note:
        $ref: 'https://example.com/shared/common.yaml#/fields/note'
"""

REMOTE_DEFS = """
order_id:
  type: long
  required: true
  unique: true
"""

COMMON_DEFS = """
fields:
  note:
    type: string
    maxLength: 100
"""

DOCS = {
    "https://example.com/contracts/c.yaml": REMOTE_CONTRACT,
    "https://example.com/contracts/definitions.yaml": REMOTE_DEFS,
    "https://example.com/shared/common.yaml": COMMON_DEFS,
}


@pytest.fixture
def mock_urlopen(monkeypatch):
    calls = []

    def fake_urlopen(req, timeout=None):
        url = req.full_url if hasattr(req, "full_url") else req
        calls.append(url)
        if url not in DOCS:
            raise urllib.error.URLError(f"unmocked URL {url}")

        class _Resp(io.BytesIO):
            def __enter__(self):
                return self

            def __exit__(self, *a):
                return False

        return _Resp(DOCS[url].encode())

    monkeypatch.setattr(urllib.request, "urlopen", fake_urlopen)
    return calls


def test_remote_contract_with_relative_and_absolute_refs(mock_urlopen):
    from raycontract import DataContract

    dc = DataContract(data_contract_file="https://example.com/contracts/c.yaml")
    f = dc.spec.models["m"].fields
    assert f["order_id"].type == "long"
    assert f["order_id"].required is True
    assert f["note"].type == "string"
    assert f["note"].maxLength == 100
    # relative ref resolved against the contract URL
    assert "https://example.com/contracts/definitions.yaml" in mock_urlopen
    assert "https://example.com/shared/common.yaml" in mock_urlopen


def test_local_contract_with_http_ref(mock_urlopen, tmp_path):
    from raycontract import DataContract

    p = tmp_path / "c.yaml"
    p.write_text("""
dataContractSpecification: 1.1.0
id: local-c
info: {title: t, version: 1.0.0}
models:
  m:
    fields:
      note:
        $ref: 'https://example.com/shared/common.yaml#/fields/note'
""")
    dc = DataContract(data_contract_file=str(p))
    assert dc.spec.models["m"].fields["note"].maxLength == 100


def test_unmocked_url_raises(mock_urlopen, tmp_path):
    from raycontract import DataContract

    p = tmp_path / "c.yaml"
    p.write_text("""
dataContractSpecification: 1.1.0
id: local-c
info: {title: t, version: 1.0.0}
models:
  m:
    fields:
      x: {$ref: 'https://nowhere.invalid/defs.yaml#/x'}
""")
    with pytest.raises(Exception):
        DataContract(data_contract_file=str(p))


def test_http_ref_document_cached_per_url(mock_urlopen):
    """The same URL referenced twice fetches once (file_cache)."""
    from raycontract import DataContract

    contract = """
dataContractSpecification: 1.1.0
id: c2
info: {title: t, version: 1.0.0}
models:
  m:
    fields:
      a: {$ref: 'https://example.com/shared/common.yaml#/fields/note'}
      b: {$ref: 'https://example.com/shared/common.yaml#/fields/note'}
"""
    DataContract(data_contract_str=contract)
    assert mock_urlopen.count("https://example.com/shared/common.yaml") == 1

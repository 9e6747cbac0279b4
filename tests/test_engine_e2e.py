"""End-to-end contract runs over Ray (mirrors the reference's golden-run
tests, tests/test_test_parquet.py:21-29 — run result + check count +
per-check verdicts), with injected-violation negative paths like
tests/test_test_quality.py:36-58 (the *named* checks fail)."""

from datetime import datetime, timezone

import pyarrow as pa
import pytest

from raycontract import DataContract, ResultEnum

CONTRACT = """
dataContractSpecification: 1.1.0
id: probe
info: {title: test, version: 1.0.0}
models:
  m:
    primaryKey: [id]
    fields:
      id: {type: string, required: true, unique: true}
      v: {type: long, maximum: 100}
      s: {type: string, pattern: "^[a-z]+$"}
      ts: {type: timestamp_ntz}
    quality:
      - type: sql
        query: "SELECT avg(v) FROM {model}"
        mustBeLessThan: 100
      - type: sql
        query: "SELECT count(*) FROM {model} WHERE v IS NULL"
        mustBe: 1
servicelevels:
  freshness: {threshold: 24h, timestampField: m.ts}
  retention: {period: P1Y, timestampField: m.ts}
"""


def table():
    return pa.table({
        "id": pa.array(["a", "b", "b", "c", None, "d"]),
        "v": pa.array([1, 5, 50, 200, 3, None], type=pa.int64()),
        "s": pa.array(["ok", "ok", "bad!", "ok", "ok", "ok"]),
        "ts": pa.array([datetime(2024, 1, d + 1) for d in range(6)],
                       type=pa.timestamp("us")),
    })


@pytest.fixture(scope="module")
def run(ray_session):
    now = datetime(2024, 1, 6, 12, tzinfo=timezone.utc)  # newest ts + 12h
    return DataContract(data_contract_str=CONTRACT).test(datasets={"m": table()}, now=now)


def by_key(run, key):
    return [c for c in run.checks if c.key == key]


def test_named_checks_fail_with_exact_counts(run):
    assert by_key(run, "m__id__field_required")[0].diagnostics["missing_count"] == 1
    assert by_key(run, "m__id__field_unique")[0].diagnostics["duplicate_values"] == 1
    assert by_key(run, "m__id__field_unique")[0].diagnostics["duplicate_rows"] == 1
    assert by_key(run, "m__v__field_maximum")[0].diagnostics["invalid_count"] == 1
    assert by_key(run, "m__s__field_regex")[0].diagnostics["invalid_count"] == 1
    for k in ("m__id__field_is_present", "m__v__field_type", "m__s__field_type"):
        assert by_key(run, k)[0].result == ResultEnum.passed
    assert run.result == ResultEnum.failed


def test_quality_sql_fast_path_and_fallback(run):
    # avg fast path (from single-pass stats): avg(v)=51.8 < 100 → passed
    q0 = by_key(run, "m__quality_sql_0")[0]
    assert q0.result == ResultEnum.passed
    assert q0.diagnostics["value"] == pytest.approx(259 / 5)
    # WHERE clause → DuckDB fallback path: exactly 1 NULL → passed
    q1 = by_key(run, "m__quality_sql_1")[0]
    assert q1.result == ResultEnum.passed
    assert q1.diagnostics["value"] == 1


def test_freshness_retention_with_injected_now(run):
    f = by_key(run, "servicelevel_freshness")[0]
    assert f.result == ResultEnum.passed  # newest ts 2024-01-06 00:00, now +12h < 24h
    r = by_key(run, "servicelevel_retention")[0]
    assert r.result == ResultEnum.passed  # oldest 2024-01-01, 6 days < P1Y


def test_freshness_fails_when_stale(ray_session):
    now = datetime(2024, 3, 1, tzinfo=timezone.utc)
    run = DataContract(data_contract_str=CONTRACT).test(datasets={"m": table()}, now=now)
    assert by_key(run, "servicelevel_freshness")[0].result == ResultEnum.failed


def test_missing_column_errors(ray_session):
    c = CONTRACT.replace("      ts: {type: timestamp_ntz}",
                         "      ts: {type: timestamp_ntz}\n      ghost: {type: string, required: true}")
    run = DataContract(data_contract_str=c).test(
        datasets={"m": table()}, now=datetime(2024, 1, 7, tzinfo=timezone.utc))
    assert by_key(run, "m__ghost__field_is_present")[0].result == ResultEnum.failed
    assert by_key(run, "m__ghost__field_required")[0].result == ResultEnum.error
    assert run.result == ResultEnum.error


def test_empty_dataset(ray_session):
    empty = table().slice(0, 0)
    run = DataContract(data_contract_str=CONTRACT).test(
        datasets={"m": empty}, now=datetime(2024, 1, 7, tzinfo=timezone.utc))
    assert by_key(run, "m__id__field_unique")[0].result == ResultEnum.passed
    assert by_key(run, "servicelevel_freshness")[0].result == ResultEnum.error


def test_row_count_root_quality(ray_session):
    c = CONTRACT + """
quality:
  type: SodaCL
  specification:
    checks for m:
      - row_count > 3
"""
    run = DataContract(data_contract_str=c).test(
        datasets={"m": table()}, now=datetime(2024, 1, 7, tzinfo=timezone.utc))
    rc = [c_ for c_ in run.checks if c_.key == "quality__sodacl"]
    assert rc and rc[0].result == ResultEnum.passed

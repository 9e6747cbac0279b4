"""Quality-SQL distributed fast paths (VERDICT r1 #9): filtered aggregates
and duplicate-shaped GROUP BY run as per-batch DuckDB partials inside
map_batches — the driver-local DuckDB fallback is only for genuinely
non-decomposable SQL (and warns loudly)."""

import logging

import pyarrow as pa
import pytest

from raycontract import DataContract, ResultEnum

CONTRACT_TMPL = """
dataContractSpecification: 1.1.0
id: qfp
info: {{title: t, version: 1.0.0}}
models:
  m:
    fields:
      k: {{type: string}}
      v: {{type: long}}
    quality:
      - type: sql
        description: {desc}
        query: "{query}"
        {threshold}
"""


def _table():
    return pa.table({
        "k": pa.array(["a", "a", "b", "b", "b", "c", None]),
        "v": pa.array([1, 2, 3, 4, 5, 60, 7], type=pa.int64()),
    })


def _run_quality(query, threshold, ray_session):
    c = CONTRACT_TMPL.format(desc="q", query=query, threshold=threshold)
    run = DataContract(data_contract_str=c).test(datasets={"m": _table()})
    checks = [ch for ch in run.checks if ch.type == "model_quality_sql"]
    assert len(checks) == 1
    return checks[0]


def test_filtered_count_fast_path(ray_session, caplog):
    with caplog.at_level(logging.WARNING, logger="raycontract.engine"):
        ch = _run_quality("SELECT count(*) FROM m WHERE v > 10", "mustBe: 1", ray_session)
    assert ch.result == ResultEnum.passed
    assert ch.diagnostics["value"] == 1
    assert "DRIVER-LOCAL" not in caplog.text  # stayed on the fast path


def test_filtered_sum_expression(ray_session):
    # arbitrary scalar expression inside the aggregate
    ch = _run_quality("SELECT sum(v * 2) FROM m WHERE k = 'b'", "mustBe: 24", ray_session)
    assert ch.result == ResultEnum.passed
    assert ch.diagnostics["value"] == 24


def test_avg_expression_decomposition(ray_session):
    ch = _run_quality("SELECT avg(v) FROM m WHERE k = 'a'", "mustBe: 1.5", ray_session)
    assert ch.result == ResultEnum.passed


def test_count_case_expression(ray_session):
    ch = _run_quality(
        "SELECT count(CASE WHEN v > 3 THEN 1 END) FROM m", "mustBe: 4", ray_session)
    assert ch.result == ResultEnum.passed


def test_grouped_duplicate_count(ray_session, caplog):
    q = ("SELECT count(*) FROM (SELECT k FROM m WHERE k IS NOT NULL "
         "GROUP BY k HAVING count(*) > 1)")
    with caplog.at_level(logging.WARNING, logger="raycontract.engine"):
        ch = _run_quality(q, "mustBe: 2", ray_session)
    assert ch.result == ResultEnum.passed
    assert ch.diagnostics["value"] == 2  # 'a' and 'b' have dups
    assert "DRIVER-LOCAL" not in caplog.text


def test_non_decomposable_falls_back_with_warning(ray_session, caplog):
    q = "SELECT count(DISTINCT k) FROM m"
    with caplog.at_level(logging.WARNING, logger="raycontract.engine"):
        ch = _run_quality(q, "mustBe: 3", ray_session)
    assert ch.result == ResultEnum.passed
    assert "DRIVER-LOCAL" in caplog.text  # loud fallback


def test_fallback_sample_mode(ray_session, monkeypatch, caplog):
    monkeypatch.setenv("RAYCONTRACT_FALLBACK_SAMPLE_ROWS", "3")
    q = "SELECT count(DISTINCT k) FROM m"
    with caplog.at_level(logging.WARNING, logger="raycontract.engine"):
        ch = _run_quality(q, "mustBeLessThanOrEqualTo: 3", ray_session)
    assert "sampled: first 3 rows" in caplog.text
    assert ch.result == ResultEnum.passed

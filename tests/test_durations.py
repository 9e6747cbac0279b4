import pytest

from raycontract.functions.durations import period_to_seconds


def test_simple_forms():
    # same fixtures as reference tests/test_data_contract_checks.py:4-10
    assert period_to_seconds("30d") == 30 * 86400
    assert period_to_seconds("24h") == 86400
    assert period_to_seconds("60m") == 3600
    assert period_to_seconds("45s") == 45
    assert period_to_seconds("2w") == 14 * 86400
    assert period_to_seconds("1y") == 365 * 86400


def test_iso_forms():
    assert period_to_seconds("P1Y") == 365 * 86400
    assert period_to_seconds("P2M") == 60 * 86400
    assert period_to_seconds("P3D") == 3 * 86400
    assert period_to_seconds("PT24H") == 86400
    assert period_to_seconds("PT90M") == 5400
    assert period_to_seconds("P1DT12H") == 86400 + 43200


def test_invalid():
    for bad in ("", "abc", "P", "10x", None):
        with pytest.raises(ValueError):
            period_to_seconds(bad)

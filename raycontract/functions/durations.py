"""Duration parsing for freshness / retention thresholds.

Same accepted grammar as the reference (``engines/data_contract_checks.py:
567-591`` for freshness thresholds and ``:674-712`` ``period_to_seconds``):
simple forms ``30d / 24h / 60m / 45s`` and ISO-8601 durations
``P[n]Y[n]M[n]D[T[n]H[n]M[n]S]`` / ``PT24H``. Months are 30 days, years 365
days (reference convention for retention math).
"""

from __future__ import annotations

import re

_SIMPLE = re.compile(r"^(\d+)([smhdwMy])$")
_ISO = re.compile(
    r"^P(?:(?P<years>\d+)Y)?(?:(?P<months>\d+)M)?(?:(?P<weeks>\d+)W)?(?:(?P<days>\d+)D)?"
    r"(?:T(?:(?P<hours>\d+)H)?(?:(?P<minutes>\d+)M)?(?:(?P<seconds>\d+(?:\.\d+)?)S)?)?$"
)

_UNIT_SECONDS = {
    "s": 1,
    "m": 60,
    "h": 3600,
    "d": 86400,
    "w": 7 * 86400,
    "M": 30 * 86400,
    "y": 365 * 86400,
}


def period_to_seconds(period: str) -> float:
    """Parse ``30d`` / ``24h`` / ``P1Y`` / ``PT24H`` … into seconds.

    Raises ValueError on unparseable input (the reference logs + errors the
    check; callers map that to result=error).
    """
    if period is None:
        raise ValueError("no period given")
    p = period.strip()
    m = _SIMPLE.match(p)
    if m:
        return int(m.group(1)) * _UNIT_SECONDS[m.group(2)]
    m = _ISO.match(p)
    if m and p not in ("P", "PT"):
        g = {k: float(v) if v else 0.0 for k, v in m.groupdict().items()}
        return (
            g["years"] * _UNIT_SECONDS["y"]
            + g["months"] * _UNIT_SECONDS["M"]
            + g["weeks"] * _UNIT_SECONDS["w"]
            + g["days"] * 86400
            + g["hours"] * 3600
            + g["minutes"] * 60
            + g["seconds"]
        )
    raise ValueError(f"cannot parse period: {period!r}")

"""Scalar datetime functions (C1-C3, SURVEY §2.7).

Driver-side parsing mirrors ``_get_datetime`` (``utility_functions.py:31-50``)
and ``_convert_timezone`` (``utility_functions.py:53-74``); column-side
equivalents are thin wrappers over Spark built-ins so they stay inside
whole-stage codegen.
"""

from __future__ import annotations

import datetime as _dt
from zoneinfo import ZoneInfo, available_timezones

from pyspark.sql import Column
from pyspark.sql import functions as F

_MIN_YEAR = 1950


def epoch_micros(col: Column) -> Column:
    """Microseconds since epoch for TIMESTAMP *and* TIMESTAMP_NTZ inputs.

    ``unix_micros`` rejects TIMESTAMP_NTZ; casting through TIMESTAMP first
    is a no-op for tz-aware inputs and interprets naive values in the
    session timezone (pinned to UTC in session.py) — wall-clock
    preserving, which matches DuckDB's epoch semantics for naive
    timestamps.
    """
    return F.unix_micros(col.cast("timestamp"))


def to_datetime(value: "_dt.datetime | str | int") -> _dt.datetime:
    """Coerce the reference's ``TimeInput`` to a datetime (C1).

    - datetime passes through
    - str is ISO-parsed (pandas-style permissiveness is reduced to ISO +
      a few common formats; the reference delegates to ``pd.to_datetime``)
    - int is a year -> Jan 1 of that year, validated 1950..now
      (``utility_functions.py:38-48``)
    """
    if isinstance(value, _dt.datetime):
        return value
    if isinstance(value, _dt.date):
        return _dt.datetime(value.year, value.month, value.day)
    if isinstance(value, int):
        now = _dt.datetime.now().year
        if not (_MIN_YEAR <= value <= now):
            raise ValueError(
                f"Integer time input must be a year in [{_MIN_YEAR}, {now}], got {value}"
            )
        return _dt.datetime(value, 1, 1)
    if isinstance(value, str):
        for fmt in (
            "%Y-%m-%d %H:%M:%S",
            "%Y-%m-%dT%H:%M:%S",
            "%Y-%m-%d %H:%M",
            "%Y-%m-%d",
            "%m/%d/%Y",
            "%Y",
        ):
            try:
                parsed = _dt.datetime.strptime(value, fmt)
                if fmt == "%Y":
                    return to_datetime(parsed.year)
                return parsed
            except ValueError:
                continue
        return _dt.datetime.fromisoformat(value)
    raise TypeError(f"Unsupported time input type: {type(value)!r}")


def convert_timezone(
    value: "_dt.datetime | str | int",
    in_timezone: str,
    out_timezone: str = "UTC",
) -> _dt.datetime:
    """Localize ``value`` to ``in_timezone`` then express it in
    ``out_timezone``, returned naive (C2; ``_convert_timezone``,
    ``utility_functions.py:53-74``). Raises on unknown tz names like the
    reference's pytz validation."""
    for tz in (in_timezone, out_timezone):
        if tz not in available_timezones() and tz != "UTC":
            raise ValueError(f"Unknown timezone: {tz!r}")
    local = to_datetime(value).replace(tzinfo=ZoneInfo(in_timezone))
    return local.astimezone(ZoneInfo(out_timezone)).replace(tzinfo=None)


def format_time(col: Column, style: str = "wes") -> Column:
    """Time formatting used by the sinks (C3).

    - ``wes``   -> ``'%Y %m %d %H %M'``  (``to_gssha.py:341,581``)
    - ``grass`` -> ``'%Y%m%d%H'``        (``to_gssha.py:462``)
    - ``cmr``   -> ISO + Z               (``nasa_from_LPDAAC.py:290-300``)
    """
    patterns = {
        "wes": "yyyy MM dd HH mm",
        "grass": "yyyyMMddHH",
        "cmr": "yyyy-MM-dd'T'HH:mm:ss'Z'",
    }
    return F.date_format(col, patterns[style])

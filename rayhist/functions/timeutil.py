"""Timestamp utilities — the OSHDBTimestamps / ISODateTimeParser
analog (``oshdb-util/.../time/OSHDBTimestamps.java:23-149``,
``time/ISODateTimeParser.java``).

The reference builds snapshot-timestamp lists from an ISO-8601 start,
end and period (YEARLY..HOURLY or an ISO period string); timestamps
here are int64 unix MICROSECONDS throughout the engine.
"""

from __future__ import annotations

from datetime import datetime, timedelta, timezone

US = 1_000_000

UNITS = {
    "YEARLY": ("years", 1),
    "MONTHLY": ("months", 1),
    "DAILY": ("days", 1),
    "HOURLY": ("hours", 1),
}


_EPOCH = datetime(1970, 1, 1, tzinfo=timezone.utc)
_US_TD = timedelta(microseconds=1)


def _to_us(dt: datetime) -> int:
    """datetime -> EXACT unix microseconds. ``int(dt.timestamp()*1e6)``
    rounds through float64 and truncates one microsecond low for ~1%
    of fractional-second instants (measured); integer timedelta
    division is exact for any representable datetime."""
    return (dt - _EPOCH) // _US_TD


def parse_iso(ts: str) -> int:
    """ISO-8601 date or datetime -> unix microseconds (UTC-naive, as
    in the reference's normalization; 'Z' suffix accepted)."""
    ts = ts.rstrip("Z")
    for fmt in ("%Y-%m-%dT%H:%M:%S.%f", "%Y-%m-%dT%H:%M:%S", "%Y-%m-%dT%H:%M", "%Y-%m-%d", "%Y-%m", "%Y"):
        try:
            dt = datetime.strptime(ts, fmt).replace(tzinfo=timezone.utc)
            return _to_us(dt)
        except ValueError:
            continue
    raise ValueError(f"unparseable ISO timestamp: {ts!r}")


def format_iso(ts_us: int) -> str:
    """unix microseconds -> ISO-8601 (TimestampFormatter analog)."""
    return datetime.fromtimestamp(ts_us / US, tz=timezone.utc).strftime("%Y-%m-%dT%H:%M:%SZ")


def _add_months(dt: datetime, n: int) -> datetime:
    import calendar

    y, m = divmod(dt.month - 1 + n, 12)
    year, month = dt.year + y, m + 1
    # clamp day-of-month to the target month's end (Java plusMonths
    # semantics): a Jan-31-anchored MONTHLY grid yields Feb 29/28
    day = min(dt.day, calendar.monthrange(year, month)[1])
    return dt.replace(year=year, month=month, day=day)


def timestamps(start: str, end: str, period: str) -> list[int]:
    """Regular timestamp grid [start, end] inclusive —
    ``OSHDBTimestamps(start, end, interval)``. period: YEARLY |
    MONTHLY | DAILY | HOURLY or ISO-8601 period (PnY, PnM, PnD,
    PTnH)."""
    t0 = datetime.fromtimestamp(parse_iso(start) / US, tz=timezone.utc)
    t1 = datetime.fromtimestamp(parse_iso(end) / US, tz=timezone.utc)

    p = period.upper()
    months = 0
    delta = None
    if p in UNITS:
        kind = UNITS[p][0]
        if kind == "years":
            months = 12
        elif kind == "months":
            months = 1
        elif kind == "days":
            delta = timedelta(days=1)
        else:
            delta = timedelta(hours=1)
    elif p.startswith("P"):
        body = p[1:]
        if body.startswith("T") and body.endswith("H"):
            delta = timedelta(hours=int(body[1:-1]))
        elif "T" in body:
            # any other time part (PT1M, PT30S, P1DT12H) would fall
            # into the date-suffix branches and die with a raw
            # int-parse error — reject loudly instead
            raise ValueError(f"unsupported period: {period!r} (only PTnH time parts)")
        elif body.endswith("Y"):
            months = 12 * int(body[:-1])
        elif body.endswith("M"):
            months = int(body[:-1])
        elif body.endswith("D"):
            delta = timedelta(days=int(body[:-1]))
        else:
            raise ValueError(f"unsupported period: {period!r}")
    else:
        raise ValueError(f"unsupported period: {period!r}")

    if months < 0 or (not months and (delta is None or delta.total_seconds() <= 0)):
        # negative month/year periods would march the grid backward
        # for thousands of iterations before a misleading 'year 0'
        raise ValueError(f"period must be positive: {period!r}")
    # each grid point is start + i*period FROM THE ORIGIN (the
    # reference multiplies the period, OSHDBTimestamps.java:185:
    # start.plus(period.multipliedBy(counter))) — chaining would
    # propagate a month-end clamp (Jan 31 -> Feb 29 -> Mar 29 instead
    # of Mar 31)
    out = []
    i = 0
    while True:
        cur = _add_months(t0, months * i) if months else t0 + delta * i
        if cur > t1:
            break
        out.append(_to_us(cur))
        i += 1
    return out

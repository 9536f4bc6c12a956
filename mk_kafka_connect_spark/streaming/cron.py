"""Quartz-style 6-field cron (sec min hour dom month dow) next-fire
computation — the engine-side replacement for the reference's Quartz
``getNextValidTimeAfter`` (``ChargeOverSourceTask.java:378-389``;
validation ``ChargeOverSourceConnectorConfig.java:159-169``).

Spark has no cron trigger; the incremental driver (``incremental.py``)
calls ``next_fire`` and launches one ``Trigger.AvailableNow``-style drain
per fire. Pure stdlib (croniter is not in this environment). Supports the
subset the reference's configs use: ``*``, ``?``, numbers, lists, ranges,
and ``*/step`` — e.g. the shipped ``0 0 2 * * ?`` (daily 02:00).
On parse errors the caller falls back to +24 h (``Task.java:385-388``).
"""

from __future__ import annotations

from datetime import datetime, timedelta

__all__ = ["CronExpression", "next_fire"]

_FIELDS = (  # (min, max) per Quartz position
    ("second", 0, 59),
    ("minute", 0, 59),
    ("hour", 0, 23),
    ("dom", 1, 31),
    ("month", 1, 12),
    ("dow", 0, 7),  # Quartz uses 1-7 SUN-SAT; we accept 0/7 = Sunday
)


class CronExpression:
    def __init__(self, expr: str):
        parts = expr.split()
        if len(parts) != 6:
            raise ValueError(f"cron must have 6 fields, got {expr!r}")
        self.sets: list[set[int] | None] = []
        for raw, (_, lo, hi) in zip(parts, _FIELDS):
            self.sets.append(self._parse_field(raw, lo, hi))

    @staticmethod
    def _parse_field(raw: str, lo: int, hi: int) -> set[int] | None:
        if raw in ("*", "?"):
            return None  # wildcard
        out: set[int] = set()
        for part in raw.split(","):
            if part.startswith("*/"):
                step = int(part[2:])
                out.update(range(lo, hi + 1, step))
            elif "-" in part:
                a, b = part.split("-")
                out.update(range(int(a), int(b) + 1))
            else:
                out.add(int(part))
        for v in out:
            if not lo <= v <= hi and not (hi == 7 and v in (0, 7)):
                raise ValueError(f"cron field value {v} out of [{lo},{hi}]")
        return out

    def _matches(self, dt: datetime) -> bool:
        sec, minute, hour, dom, month, dow = self.sets
        if sec is not None and dt.second not in sec:
            return False
        if minute is not None and dt.minute not in minute:
            return False
        if hour is not None and dt.hour not in hour:
            return False
        if dom is not None and dt.day not in dom:
            return False
        if month is not None and dt.month not in month:
            return False
        if dow is not None:
            # Python Monday=0..Sunday=6 → cron Sunday∈{0,7}, Mon=1..Sat=6
            cron_dow = (dt.weekday() + 1) % 7
            if cron_dow not in dow and not (cron_dow == 0 and 7 in dow):
                return False
        return True

    def next_after(self, after: datetime, limit_days: int = 1500) -> datetime:
        """Smallest matching instant strictly after ``after`` (second
        resolution). Walks day-then-second with pruning; bounded search."""
        dt = (after + timedelta(seconds=1)).replace(microsecond=0)
        horizon = after + timedelta(days=limit_days)
        while dt <= horizon:
            if not self._day_matches(dt):
                dt = (dt + timedelta(days=1)).replace(hour=0, minute=0, second=0)
                continue
            found = self._next_time_in_day(dt)
            if found is not None:
                return found
            dt = (dt + timedelta(days=1)).replace(hour=0, minute=0, second=0)
        raise ValueError("no cron fire within horizon")

    def _day_matches(self, dt: datetime) -> bool:
        probe = dt.replace(hour=0, minute=0, second=0)
        sec, minute, hour, dom, month, dow = self.sets
        if month is not None and probe.month not in month:
            return False
        if dom is not None and probe.day not in dom:
            return False
        if dow is not None:
            cron_dow = (probe.weekday() + 1) % 7
            if cron_dow not in dow and not (cron_dow == 0 and 7 in dow):
                return False
        return True

    def _next_time_in_day(self, start: datetime) -> datetime | None:
        sec_set, min_set, hour_set = (
            sorted(self.sets[0]) if self.sets[0] is not None else range(60),
            sorted(self.sets[1]) if self.sets[1] is not None else range(60),
            sorted(self.sets[2]) if self.sets[2] is not None else range(24),
        )
        for h in hour_set:
            if h < start.hour:
                continue
            for m in min_set:
                if h == start.hour and m < start.minute:
                    continue
                for s in sec_set:
                    if h == start.hour and m == start.minute and s < start.second:
                        continue
                    return start.replace(hour=h, minute=m, second=s)
        return None


def next_fire(expr: str, after: datetime) -> datetime:
    """Next fire time; on invalid expressions fall back to after+24h
    exactly like Task.java:385-388."""
    try:
        return CronExpression(expr).next_after(after)
    except ValueError:
        return after + timedelta(hours=24)

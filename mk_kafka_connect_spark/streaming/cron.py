"""Quartz-style 6-field cron (sec min hour dom month dow) next-fire
computation — the engine-side replacement for the reference's Quartz
``getNextValidTimeAfter`` (``ChargeOverSourceTask.java:378-389``;
validation ``ChargeOverSourceConnectorConfig.java:159-169``) including
the timezone-aware scheduling of
``ChargeOverSourceConnectorConfig.java:64-68,164`` (``cron.timezone``:
the shipped ``0 0 2 * * ?`` means 02:00 IN THE CONFIGURED ZONE, with DST
handled like Quartz does).

Spark has no cron trigger; the incremental driver (``incremental.py``)
calls ``next_fire`` and launches one ``Trigger.AvailableNow``-style drain
per fire. Pure stdlib (croniter is not in this environment; zoneinfo IS).
Supports the subset the reference's configs use: ``*``, ``?``, numbers,
lists, ranges, and ``*/step`` — e.g. the shipped ``0 0 2 * * ?`` (daily
02:00). Day-of-week uses QUARTZ numbering: 1=SUN .. 7=SAT (0 is rejected
— Unix-cron 0=Sunday would silently fire a day late if accepted as-is).
On parse errors the caller falls back to +24 h (``Task.java:385-388``).

Timezone semantics (``tz`` given):
* ``after`` is interpreted as naive UTC (the driver's clock), the
  wall-clock walk happens in ``tz``, and the result comes back as naive
  UTC — so callers compare clocks without ever touching tz math.
* Spring-forward gap: wall times that do not exist are skipped to the
  next matching wall time (Quartz behavior for a daily job: next day).
* Fall-back overlap: ambiguous wall times fire on their FIRST (pre-
  transition, fold=0) occurrence only.
"""

from __future__ import annotations

from datetime import datetime, timedelta, timezone
from zoneinfo import ZoneInfo

__all__ = ["CronExpression", "next_fire"]

_FIELDS = (  # (name, min, max) per Quartz position
    ("second", 0, 59),
    ("minute", 0, 59),
    ("hour", 0, 23),
    ("dom", 1, 31),
    ("month", 1, 12),
    ("dow", 1, 7),  # QUARTZ: 1=SUN .. 7=SAT
)


class CronExpression:
    def __init__(self, expr: str, tz: str | None = None):
        parts = expr.split()
        if len(parts) != 6:
            raise ValueError(f"cron must have 6 fields, got {expr!r}")
        self.sets: list[set[int] | None] = []
        for raw, (name, lo, hi) in zip(parts, _FIELDS):
            self.sets.append(self._parse_field(raw, name, lo, hi))
        self.tz = ZoneInfo(tz) if tz else None

    @staticmethod
    def _parse_field(raw: str, name: str, lo: int, hi: int) -> set[int] | None:
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
            if not lo <= v <= hi:
                if name == "dow" and v == 0:
                    raise ValueError(
                        "cron dow uses QUARTZ numbering 1=SUN..7=SAT; 0 is "
                        "rejected rather than silently meaning Unix Sunday"
                    )
                raise ValueError(f"cron {name} value {v} out of [{lo},{hi}]")
        return out

    @staticmethod
    def _quartz_dow(dt: datetime) -> int:
        # Python Monday=0..Sunday=6  →  Quartz SUN=1..SAT=7
        return ((dt.weekday() + 1) % 7) + 1

    def _day_matches(self, dt: datetime) -> bool:
        _, _, _, dom, month, dow = self.sets
        if month is not None and dt.month not in month:
            return False
        if dom is not None and dt.day not in dom:
            return False
        if dow is not None and self._quartz_dow(dt) not in dow:
            return False
        return True

    def _times_in_day(self, start: datetime):
        """Yield each matching wall-clock time ≥ ``start`` within
        ``start``'s day, in order."""
        sec_set = sorted(self.sets[0]) if self.sets[0] is not None else range(60)
        min_set = sorted(self.sets[1]) if self.sets[1] is not None else range(60)
        hour_set = sorted(self.sets[2]) if self.sets[2] is not None else range(24)
        for h in hour_set:
            if h < start.hour:
                continue
            for m in min_set:
                if h == start.hour and m < start.minute:
                    continue
                for s in sec_set:
                    if h == start.hour and m == start.minute and s < start.second:
                        continue
                    yield start.replace(hour=h, minute=m, second=s)

    def _walk_wall(self, after_wall: datetime, horizon_days: int):
        """Yield matching wall-clock instants strictly after
        ``after_wall`` in chronological order."""
        dt = (after_wall + timedelta(seconds=1)).replace(microsecond=0)
        horizon = after_wall + timedelta(days=horizon_days)
        while dt <= horizon:
            if self._day_matches(dt):
                yield from self._times_in_day(dt)
            dt = (dt + timedelta(days=1)).replace(hour=0, minute=0, second=0)

    def next_after(self, after: datetime, limit_days: int = 1500) -> datetime:
        """Smallest matching instant strictly after ``after`` (second
        resolution). Naive in/out: without ``tz`` both are plain wall
        clock; with ``tz`` both are UTC and matching happens on the
        ZONE's wall clock (DST rules above)."""
        if self.tz is None:
            for wall in self._walk_wall(after, limit_days):
                return wall
            raise ValueError("no cron fire within horizon")

        after_utc = after.replace(tzinfo=timezone.utc)
        after_wall = after_utc.astimezone(self.tz).replace(tzinfo=None)
        for wall in self._walk_wall(after_wall, limit_days):
            aware = wall.replace(tzinfo=self.tz, fold=0)
            # Spring-forward gap: a nonexistent wall time round-trips to a
            # DIFFERENT wall time — skip it (the job fires at its next
            # real occurrence).
            if aware.astimezone(timezone.utc).astimezone(self.tz).replace(
                tzinfo=None
            ) != wall:
                continue
            fire_utc = aware.astimezone(timezone.utc).replace(tzinfo=None)
            # Fall-back overlap: fold=0 is the first occurrence; it can
            # land at-or-before `after` even though the wall clock reads
            # later — keep walking until strictly after.
            if fire_utc <= after:
                continue
            return fire_utc
        raise ValueError("no cron fire within horizon")


def next_fire(expr: str, after: datetime, tz: str | None = None) -> datetime:
    """Next fire time; on invalid expressions fall back to after+24h
    exactly like Task.java:385-388."""
    try:
        return CronExpression(expr, tz=tz).next_after(after)
    except (ValueError, KeyError):
        return after + timedelta(hours=24)

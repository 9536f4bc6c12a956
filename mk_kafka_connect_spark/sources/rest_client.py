"""Paginated REST client with the reference's retry/backoff/rate-limit
semantics (``ChargeOverApiClient.java:80-183`` + ``ChargeOverSourceTask.java:294-343``):

* query construction: half-open datetime range (``field:GTE:start,field:LT:end``
  with colon escaping), ascending sort on the datetime field, limit/offset
  pagination, verbatim extra params (``fields=``/``expand=``)
* response parsing: ``{"response": [...]}`` envelope or bare JSON array
* ``has_more`` inferred from a full page (``ApiClient.java:163-167``)
* retry: up to ``max_retries`` attempts; general errors back off
  ``2^attempt × 1 s + 10 % jitter`` capped at 30 s (``Task.java:329-337``);
  HTTP 429 waits a fixed 60 s (``Task.java:314-324``)
* connection test: one-row probe, success = HTTP 200 (``ApiClient.java:185-209``)

Pure stdlib (urllib) so it runs inside DataSource partitions on any
executor. ``sleeper`` is injectable for tests.
"""

from __future__ import annotations

import base64
import json
import random
import time
import urllib.error
import urllib.parse
import urllib.request
from collections.abc import Callable
from dataclasses import dataclass

__all__ = ["FetchResult", "RateLimitError", "RestClient"]

RATE_LIMIT_WAIT_S = 60.0  # Task.java:318
BACKOFF_CAP_S = 30.0  # Task.java:333


class RateLimitError(Exception):
    """HTTP 429 (ChargeOverRateLimitException.java:8-12)."""


@dataclass
class FetchResult:
    """Mirror of ApiClient.java:36-58."""

    records: list[dict]
    has_more: bool
    total_fetched: int


class RestClient:
    def __init__(
        self,
        base_url: str,
        username: str = "",
        password: str = "",
        timeout_s: float = 30.0,
        max_retries: int = 3,
        sleeper: Callable[[float], None] = time.sleep,
        rng: random.Random | None = None,
    ) -> None:
        self.base_url = base_url.rstrip("/")
        self.username = username
        self.password = password
        self.timeout_s = timeout_s
        self.max_retries = max_retries
        self.sleep = sleeper
        self.rng = rng or random.Random(0)

    # -- query construction (the reference's "planner", ApiClient.java:84-129)

    def build_url(
        self,
        entity: str,
        datetime_field: str,
        start_datetime: str | None,
        end_datetime: str | None,
        offset: int,
        limit: int,
        extra_params: str = "",
    ) -> str:
        url = f"{self.base_url}/{entity}?limit={limit}&offset={offset}"
        conditions = []
        if start_datetime:
            conditions.append(self._condition(datetime_field, "GTE", start_datetime))
        if end_datetime:
            conditions.append(self._condition(datetime_field, "LT", end_datetime))
        if conditions:
            url += "&where=" + ",".join(conditions)
        url += f"&order={datetime_field}:ASC"  # ApiClient.java:115-116
        if extra_params:
            url += "&" + extra_params  # verbatim, ApiClient.java:118-122
        return url

    @staticmethod
    def _condition(field: str, op: str, value: str) -> str:
        """``field:OP:value`` with backslash-escaped colons in the value,
        URL-encoded (ApiClient.java:96-112)."""
        escaped = value.replace(":", r"\:")
        return urllib.parse.quote(f"{field}:{op}:{escaped}", safe="\\:")

    # -- execution --------------------------------------------------------

    def _request(self, url: str) -> list[dict]:
        req = urllib.request.Request(url)
        if self.username or self.password:
            tok = base64.b64encode(
                f"{self.username}:{self.password}".encode()
            ).decode()  # Basic auth, ApiClient.java:133-138
            req.add_header("Authorization", f"Basic {tok}")
        try:
            with urllib.request.urlopen(req, timeout=self.timeout_s) as resp:
                body = resp.read().decode("utf-8")
        except urllib.error.HTTPError as e:
            if e.code == 429:  # ApiClient.java:169-171
                raise RateLimitError(url) from e
            raise
        parsed = json.loads(body) if body.strip() else []
        if isinstance(parsed, dict):  # {"response": [...]} envelope
            parsed = parsed.get("response", [])
        if not isinstance(parsed, list):
            raise ValueError(f"unexpected response shape from {url}")
        return parsed

    def fetch_page(
        self,
        entity: str,
        datetime_field: str,
        start_datetime: str | None,
        end_datetime: str | None,
        offset: int,
        limit: int,
        extra_params: str = "",
    ) -> FetchResult:
        url = self.build_url(
            entity, datetime_field, start_datetime, end_datetime, offset, limit, extra_params
        )
        records = self._request(url)
        return FetchResult(
            records=records,
            has_more=len(records) == limit,  # ApiClient.java:163-167
            total_fetched=len(records),
        )

    def fetch_page_with_retry(self, *args, **kwargs) -> FetchResult:
        """Task.java:294-343: general errors → exponential backoff with
        10% jitter capped at 30 s; 429 → fixed 60 s wait; give up after
        max_retries attempts."""
        last: Exception | None = None
        for attempt in range(self.max_retries + 1):
            try:
                return self.fetch_page(*args, **kwargs)
            except RateLimitError as e:
                last = e
                if attempt < self.max_retries:
                    self.sleep(RATE_LIMIT_WAIT_S)
            except Exception as e:  # noqa: BLE001 - retry everything like the reference
                last = e
                if attempt < self.max_retries:
                    base = min(2**attempt * 1.0, BACKOFF_CAP_S)
                    jitter = base * 0.1 * self.rng.random()  # Task.java:334-336
                    self.sleep(min(base + jitter, BACKOFF_CAP_S))
        raise last  # type: ignore[misc]

    def fetch_all(
        self,
        entity: str,
        datetime_field: str,
        start_datetime: str | None,
        end_datetime: str | None,
        limit: int,
        extra_params: str = "",
        start_offset: int = 0,
    ):
        """Generator over all pages from ``start_offset`` — the pagination
        loop of Task.java:195-240, resumable at any page boundary."""
        offset = start_offset
        while True:
            page = self.fetch_page_with_retry(
                entity, datetime_field, start_datetime, end_datetime, offset, limit, extra_params
            )
            yield offset, page
            if not page.has_more:
                return
            offset += page.total_fetched  # Task.java:221-226

    def test_connection(self) -> bool:
        """ApiClient.java:185-209: one-row probe."""
        try:
            self._request(f"{self.base_url}/customer?limit=1")
            return True
        except Exception:  # noqa: BLE001
            return False

"""REST / ticketed ingestion source — the engine restatement of the
reference's Dock-API extraction flow (SURVEY.md §2-A R1-R4):

    authenticate (REPORT:25-49) → request report for a day, get a ticket
    (REPORT:52-81) → poll the ticket for the produced file (REPORT:84-118)
    → land the file.

Design: the HTTP transport is injectable (`Transport` protocol). Network
I/O happens driver-side only — the cluster never blocks on an API — and
the landed payload becomes a DataFrame via ``spark.createDataFrame`` for
small control-plane envelopes or a path handed to the parquet/CSV/binary
readers for bulk data. Retries and null-guard validation mirror the
reference's semantics (retries REPORT:21-22, guards REPORT:45-46,
75-76, 112-113).

No real network exists in this environment, so the default transport is
a deterministic in-memory fake of the Dock API shape (auth token /
ticket / file-name envelopes, FIXTURES.md §1); swapping in a
requests-backed transport is a one-class change.
"""

from __future__ import annotations

import json
import time
from dataclasses import dataclass, field
from typing import Callable, Protocol

from pyspark.sql import DataFrame, SparkSession

from dock_financial_data_pipelines_spark.registry import query


class TransportError(RuntimeError):
    pass


class Transport(Protocol):
    def post(self, url: str, auth: tuple[str, str]) -> dict: ...

    def get(self, url: str, token: str) -> dict: ...


@dataclass
class FakeDockTransport:
    """Deterministic stand-in for the Dock API (envelope shapes from
    FIXTURES.md §1). ``fail_first`` simulates transient faults to
    exercise the retry path."""

    fail_first: int = 0
    poll_not_ready: int = 1
    _calls: dict = field(default_factory=dict)

    def _maybe_fail(self, key: str) -> None:
        n = self._calls.get(key, 0)
        self._calls[key] = n + 1
        if n < self.fail_first:
            raise TransportError(f"transient error on {key} (call {n})")

    def post(self, url: str, auth: tuple[str, str]) -> dict:
        self._maybe_fail("auth")
        return {"access_token": f"tok-{auth[0]}"}

    def get(self, url: str, token: str) -> dict:
        if not token.startswith("tok-"):
            raise TransportError("unauthorized")
        if "statements" in url:
            return {"fileName": f"statements_{url.split('startDate=')[-1][:10]}.zip"}
        if "ticket=" in url:
            key = "poll"
            n = self._calls.get(key, 0)
            self._calls[key] = n + 1
            if n < self.poll_not_ready:
                return {"file": None}  # not produced yet
            ticket = url.split("ticket=")[-1]
            return {"file": f"balance_{ticket}.zip"}
        if "date=BALANCE" in url:
            self._maybe_fail("request")
            day = url.split("day=")[-1][:10]
            return {"ticket": f"T{day.replace('-', '')}"}
        raise TransportError(f"unknown endpoint: {url}")


def _require(value, what: str):
    # Null-guard validation, as in REPORT:45-46 / 75-76 / 112-113.
    if not value:
        raise ValueError(f"{what} missing from API response")
    return value


def with_retries(fn: Callable[[], dict], retries: int = 3, delay_s: float = 0.0) -> dict:
    """The reference's task retry policy (REPORT:21-22) at call site."""
    last: Exception | None = None
    for _ in range(retries + 1):
        try:
            return fn()
        except (TransportError, ValueError) as exc:  # noqa: PERF203
            last = exc
            if delay_s:
                time.sleep(delay_s)
    raise last  # type: ignore[misc]


@dataclass
class DockIngestClient:
    transport: Transport
    auth_url: str = "https://auth.dock.example/token"
    transactions_url: str = "https://api.dock.example/transactions"
    accounts_url: str = "https://api.dock.example/accounts"
    client_id: str = "client"
    secret: str = "secret"

    def authenticate(self) -> str:
        resp = with_retries(lambda: self.transport.post(self.auth_url, (self.client_id, self.secret)))
        return _require(resp.get("access_token"), "access_token")

    def request_balance_report(self, day: str) -> str:
        token = self.authenticate()
        url = f"{self.transactions_url}?compressZipService=0&date=BALANCE&day={day}"
        resp = with_retries(lambda: self.transport.get(url, token))
        return _require(resp.get("ticket"), "ticket")

    def poll_ticket(self, ticket: str, attempts: int = 10) -> str:
        token = self.authenticate()
        url = f"{self.transactions_url}?ticket={ticket}"
        for _ in range(attempts):
            resp = self.transport.get(url, token)
            if resp.get("file"):
                return resp["file"]
        raise TimeoutError(f"ticket {ticket} never produced a file")

    def request_statements(self, account_id: str, start: str, end: str) -> str:
        token = self.authenticate()
        url = (
            f"{self.accounts_url}/{account_id}/statements"
            f"?startDate={start}&endDate={end}"
        )
        resp = with_retries(lambda: self.transport.get(url, token))
        return _require(resp.get("fileName"), "fileName")


def ingest_control_plane(
    spark: SparkSession, client: DockIngestClient, days: list[str]
) -> DataFrame:
    """Run the request→ticket→poll flow for a list of days and return the
    landing manifest as a DataFrame (driver-side control plane; the bulk
    file contents flow through the binary/CSV readers, never this path)."""
    rows = []
    for day in days:
        ticket = client.request_balance_report(day)
        file_name = client.poll_ticket(ticket)
        rows.append(
            {
                "day": day,
                "ticket": ticket,
                "file_name": file_name,
                "manifest": json.dumps({"bucket": "dock-landing", "keys": [file_name]}),
            }
        )
    return spark.createDataFrame(rows)


@query(
    "r_rest_ticketed_ingest",
    # The faked control plane is deterministic end-to-end, so the full
    # auth→request→poll→manifest flow (including the injected transient
    # fault the retry policy must absorb) is held to its exact expected
    # output — any change in ticketing, naming, or manifest shape fails
    # the hash compare.
    oracle="""
    SELECT * FROM (VALUES
        ('2024-01-01', 'T20240101', 'balance_T20240101.zip',
         '{"bucket": "dock-landing", "keys": ["balance_T20240101.zip"]}'),
        ('2024-01-02', 'T20240102', 'balance_T20240102.zip',
         '{"bucket": "dock-landing", "keys": ["balance_T20240102.zip"]}'),
        ('2024-01-03', 'T20240103', 'balance_T20240103.zip',
         '{"bucket": "dock-landing", "keys": ["balance_T20240103.zip"]}')
    ) AS t(day, ticket, file_name, manifest)
    """,
)
def r_rest_ticketed_ingest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Smoke the full auth→request→poll→manifest flow, including one
    transient fault absorbed by the retry policy."""
    client = DockIngestClient(transport=FakeDockTransport(fail_first=1))
    days = ["2024-01-01", "2024-01-02", "2024-01-03"]
    return ingest_control_plane(spark, client, days).select(
        "day", "ticket", "file_name", "manifest"
    )

"""REST/ticketed ingest client: retry, null-guard, and polling semantics
(the reference's task-level behaviors, REPORT:21-22 / 45-46 / 84-118)."""

from __future__ import annotations

import pytest

from dock_financial_data_pipelines_spark.sources.rest import (
    DockIngestClient,
    FakeDockTransport,
    TransportError,
    with_retries,
)


def test_auth_token_flows_into_requests():
    client = DockIngestClient(transport=FakeDockTransport())
    assert client.authenticate() == "tok-client"
    assert client.request_balance_report("2024-01-05") == "T20240105"


def test_poll_waits_until_file_is_produced():
    client = DockIngestClient(transport=FakeDockTransport(poll_not_ready=3))
    ticket = client.request_balance_report("2024-01-05")
    assert client.poll_ticket(ticket) == f"balance_{ticket}.zip"


def test_poll_times_out():
    client = DockIngestClient(transport=FakeDockTransport(poll_not_ready=99))
    with pytest.raises(TimeoutError):
        client.poll_ticket("T1", attempts=2)


def test_transient_faults_absorbed_by_retries():
    client = DockIngestClient(transport=FakeDockTransport(fail_first=2))
    assert client.authenticate() == "tok-client"


def test_retries_exhausted_reraises():
    calls = []

    def always_fail():
        calls.append(1)
        raise TransportError("down")

    with pytest.raises(TransportError):
        with_retries(always_fail, retries=2)
    assert len(calls) == 3


def test_statements_range_request():
    client = DockIngestClient(transport=FakeDockTransport())
    name = client.request_statements("acct1", "2024-01-04", "2024-01-05")
    assert name == "statements_2024-01-04.zip"

"""RequestsTransport + sensor/transfer landing flow: retry, timeout, and
failure-injection paths for both the fake and the requests-backed
transports (no network — failures injected via stub sessions)."""

from __future__ import annotations

import os

import pytest

from dock_financial_data_pipelines_spark.sources.rest import (
    DockIngestClient,
    TransportError,
)
from dock_financial_data_pipelines_spark.sources.transports import (
    LocalDirRemote,
    RequestsTransport,
    Sensor,
    transfer_to_landing,
)


class _Resp:
    def __init__(self, status_code=200, payload=None, bad_json=False):
        self.status_code = status_code
        self._payload = payload or {}
        self._bad_json = bad_json

    def json(self):
        if self._bad_json:
            raise ValueError("not json")
        return self._payload


class _StubSession:
    """Scripted requests.Session stand-in: pops one response (or
    exception) per call, recording the calls it saw."""

    def __init__(self, script):
        self.script = list(script)
        self.calls = []

    def _next(self, kind, url):
        self.calls.append((kind, url))
        item = self.script.pop(0)
        if isinstance(item, Exception):
            raise item
        return item

    def post(self, url, **kwargs):
        return self._next("post", url)

    def get(self, url, **kwargs):
        return self._next("get", url)


def test_requests_transport_happy_path():
    session = _StubSession(
        [
            _Resp(payload={"access_token": "tok-live"}),
            _Resp(payload={"ticket": "T1"}),
        ]
    )
    t = RequestsTransport(session=session)
    client = DockIngestClient(transport=t)
    assert client.authenticate() == "tok-live"
    # re-auth per stage (reference behavior) would consume another auth
    # response; here we call the transport directly for the second leg.
    assert t.get("https://api.dock.example/x", "tok-live")["ticket"] == "T1"


def test_requests_transport_maps_http_errors():
    t = RequestsTransport(session=_StubSession([_Resp(status_code=503)]))
    with pytest.raises(TransportError, match="503"):
        t.get("https://api.dock.example/x", "tok")


def test_requests_transport_maps_connection_errors():
    t = RequestsTransport(session=_StubSession([ConnectionError("refused")]))
    with pytest.raises(TransportError, match="refused"):
        t.post("https://auth.dock.example/token", ("id", "secret"))


def test_requests_transport_rejects_non_json():
    t = RequestsTransport(session=_StubSession([_Resp(bad_json=True)]))
    with pytest.raises(TransportError, match="non-JSON"):
        t.get("https://api.dock.example/x", "tok")


def test_client_retries_absorb_transient_http_faults():
    # auth fails twice (503, connection reset) then succeeds — the
    # with_retries policy (retries=3) must absorb both.
    session = _StubSession(
        [
            _Resp(status_code=503),
            ConnectionError("reset"),
            _Resp(payload={"access_token": "tok-live"}),
        ]
    )
    client = DockIngestClient(transport=RequestsTransport(session=session))
    assert client.authenticate() == "tok-live"
    assert len(session.calls) == 3


def test_sensor_finds_file_after_polls(tmp_path):
    upload = tmp_path / "upload"
    upload.mkdir()
    polls = {"n": 0}

    class LateRemote(LocalDirRemote):
        def listdir(self, path):
            polls["n"] += 1
            if polls["n"] >= 3:  # file "arrives" on the third poll
                (upload / "balance_T1.zip").write_bytes(b"zip")
            return super().listdir(path)

    sensor = Sensor(remote=LateRemote(root=str(tmp_path)), path="upload", attempts=5)
    found = sensor.wait_for(lambda n: n.endswith(".zip"))
    assert found == os.path.join("upload", "balance_T1.zip")
    assert polls["n"] == 3


def test_sensor_times_out(tmp_path):
    (tmp_path / "upload").mkdir()
    sensor = Sensor(remote=LocalDirRemote(root=str(tmp_path)), path="upload", attempts=2)
    with pytest.raises(TimeoutError):
        sensor.wait_for(lambda n: n.endswith(".zip"))


def test_transfer_retries_then_succeeds(tmp_path):
    src = tmp_path / "remote" / "f.zip"
    src.parent.mkdir()
    src.write_bytes(b"payload")
    attempts = {"n": 0}

    class FlakyRemote(LocalDirRemote):
        def fetch(self, remote_path, local_path):
            attempts["n"] += 1
            if attempts["n"] < 3:
                raise OSError("sftp hiccup")
            super().fetch(remote_path, local_path)

    landed = transfer_to_landing(
        FlakyRemote(root=str(tmp_path)), "remote/f.zip", str(tmp_path / "landing")
    )
    assert open(landed, "rb").read() == b"payload"
    assert attempts["n"] == 3


def test_transfer_retries_exhausted(tmp_path):
    class DownRemote(LocalDirRemote):
        def fetch(self, remote_path, local_path):
            raise OSError("down")

    with pytest.raises(OSError, match="down"):
        transfer_to_landing(
            DownRemote(root=str(tmp_path)), "remote/f.zip", str(tmp_path / "landing"),
            retries=2,
        )


class _FakeS3Client:
    """In-memory stand-in for boto3's S3 client: a dict of key → bytes,
    paginated listings (page size 2 to exercise continuation), and
    recorded uploads."""

    def __init__(self, objects=None, page_size=2):
        self.objects = dict(objects or {})
        self.page_size = page_size
        self.uploads = []

    def list_objects_v2(self, Bucket, Prefix="", ContinuationToken=None):
        keys = sorted(k for k in self.objects if k.startswith(Prefix))
        start = int(ContinuationToken) if ContinuationToken else 0
        page = keys[start : start + self.page_size]
        truncated = start + self.page_size < len(keys)
        resp = {"Contents": [{"Key": k} for k in page], "IsTruncated": truncated}
        if truncated:
            resp["NextContinuationToken"] = str(start + self.page_size)
        return resp

    def download_file(self, bucket, key, local_path):
        if key not in self.objects:
            raise OSError(f"NoSuchKey: {key}")
        with open(local_path, "wb") as fh:
            fh.write(self.objects[key])

    def upload_file(self, local_path, bucket, key):
        with open(local_path, "rb") as fh:
            self.objects[key] = fh.read()
        self.uploads.append((bucket, key))


def test_s3_remote_lists_direct_children_with_pagination(tmp_path):
    from dock_financial_data_pipelines_spark.sources.transports import S3Remote

    client = _FakeS3Client(
        {
            "exports/upload/a.zip": b"a",
            "exports/upload/b.zip": b"b",
            "exports/upload/c.zip": b"c",
            "exports/upload/nested/d.zip": b"d",  # not a direct child
            "exports/other/e.zip": b"e",
        }
    )
    remote = S3Remote("dock-bucket", prefix="exports", client=client)
    assert remote.listdir("upload") == ["a.zip", "b.zip", "c.zip"]


def test_s3_remote_fetch_put_roundtrip(tmp_path):
    from dock_financial_data_pipelines_spark.sources.transports import S3Remote

    client = _FakeS3Client({"landing/f.zip": b"payload"})
    remote = S3Remote("dock-bucket", client=client)
    local = str(tmp_path / "out" / "f.zip")
    remote.fetch("landing/f.zip", local)
    assert open(local, "rb").read() == b"payload"
    remote.put(local, "published/f.zip")
    assert client.objects["published/f.zip"] == b"payload"
    assert client.uploads == [("dock-bucket", "published/f.zip")]


def test_s3_remote_drives_sensor_and_transfer(tmp_path):
    """The S3-backed remote satisfies the same protocol, so the landing
    flow (sense → transfer) runs unchanged against an object store."""
    from dock_financial_data_pipelines_spark.sources.transports import S3Remote

    client = _FakeS3Client({"upload/balance_T9.zip": b"zipbytes"})
    remote = S3Remote("dock-bucket", client=client)
    sensor = Sensor(remote=remote, path="upload", attempts=2)
    found = sensor.wait_for(lambda n: n.endswith(".zip"))
    landed = transfer_to_landing(remote, found, str(tmp_path / "landing"))
    assert open(landed, "rb").read() == b"zipbytes"


def test_s3_remote_requires_boto3_without_injected_client(monkeypatch):
    """No injected client and no boto3 → a clear construction-time
    error. boto3 IS installed in this container now, so its absence is
    simulated at the import seam (sys.modules[boto3]=None makes the
    in-function import raise ImportError) — the test no longer skips
    either way."""
    import sys

    from dock_financial_data_pipelines_spark.sources.transports import S3Remote

    monkeypatch.setitem(sys.modules, "boto3", None)
    with pytest.raises(RuntimeError, match="boto3"):
        S3Remote("dock-bucket")


def test_s3_remote_constructs_real_client_when_boto3_present():
    """With boto3 present and no injected client, construction takes
    the REAL branch: boto3.client('s3') is built (no network I/O at
    construction time — boto3 resolves credentials lazily)."""
    pytest.importorskip("boto3")
    from dock_financial_data_pipelines_spark.sources.transports import S3Remote

    remote = S3Remote("dock-bucket")
    # the client is a genuine botocore S3 client, not a fake
    assert type(remote._client).__module__.startswith("botocore")


def test_sink_location_resolves_schemes():
    from dock_financial_data_pipelines_spark.sources.sinks import (
        SinkLocation,
        s3a_conf,
    )

    local = SinkLocation()
    assert local.base_uri.startswith("file://")
    prod = SinkLocation(base_uri="s3a://dock-reports/prod/")
    assert (
        prod.path("balance_report", "report_date=2026-08-13")
        == "s3a://dock-reports/prod/balance_report/report_date=2026-08-13"
    )
    conf = s3a_conf(bucket_region="us-east-1")
    assert conf["spark.hadoop.fs.s3a.committer.name"] == "magic"
    assert conf["spark.hadoop.fs.s3a.endpoint.region"] == "us-east-1"
    # no secret material is ever embedded in the conf surface
    assert not any("secret" in k.lower() or "key" in v for k, v in conf.items())


def test_sftp_remote_requires_paramiko():
    import importlib.util

    from dock_financial_data_pipelines_spark.sources.transports import SftpRemote

    if importlib.util.find_spec("paramiko") is not None:
        import pytest as _pytest

        _pytest.skip("paramiko present in this environment")
    with pytest.raises(RuntimeError, match="paramiko"):
        SftpRemote("sftp.dock.example", "user", "pw")

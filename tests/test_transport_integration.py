"""In-sandbox transport integration (r12 verdict gap #1): the engine's
SFTP→landing and S3 control-plane flows proven against REAL client
stacks instead of hand-rolled fakes.

- ``S3Remote`` runs against moto's in-process AWS mock with a genuine
  ``boto3.client("s3")``: real request/response marshalling, real
  1000-key listing truncation, real download/upload file handling —
  the parts ``_FakeS3Client`` (test_transports.py) can only imitate.
- ``SftpRemote`` runs against a local-directory-backed ``paramiko``
  twin injected into ``sys.modules`` (the container ships no paramiko
  and no network): the remote's own construction/listdir/fetch code —
  the lines marked ``pragma: no cover - needs network`` — execute for
  real; only the wire protocol is faked, at the library seam.

Reference parity target: REPORT:166-178 transfer semantics (sense →
fetch to landing, overwrite on re-run, no temp-file debris).
"""

from __future__ import annotations

import os
import sys
import types

import pytest

from dock_financial_data_pipelines_spark.sources.transports import (
    S3Remote,
    Sensor,
    transfer_to_landing,
)

boto3 = pytest.importorskip("boto3")
moto = pytest.importorskip("moto")


@pytest.fixture()
def s3_remote():
    with moto.mock_aws():
        client = boto3.client("s3", region_name="us-east-1")
        client.create_bucket(Bucket="dock-bucket")
        yield S3Remote("dock-bucket", prefix="exports", client=client), client


def test_moto_s3_listdir_paginates_past_1000_keys(s3_remote):
    """moto enforces the real 1000-key page cap; 1003 direct children
    prove the ContinuationToken loop against genuine truncation."""
    remote, client = s3_remote
    for i in range(1003):
        client.put_object(
            Bucket="dock-bucket", Key=f"exports/upload/f{i:04d}.zip",
            Body=b"x",
        )
    client.put_object(  # not a direct child: must be excluded
        Bucket="dock-bucket", Key="exports/upload/nested/deep.zip",
        Body=b"x",
    )
    names = remote.listdir("upload")
    assert len(names) == 1003
    assert names[0] == "f0000.zip" and names[-1] == "f1002.zip"
    assert "deep.zip" not in names


def test_moto_s3_fetch_put_roundtrip_and_overwrite(s3_remote, tmp_path):
    remote, client = s3_remote
    client.put_object(
        Bucket="dock-bucket", Key="exports/upload/balance_T9.zip",
        Body=b"v1-bytes",
    )
    local = str(tmp_path / "landing" / "balance_T9.zip")
    remote.fetch("upload/balance_T9.zip", local)
    assert open(local, "rb").read() == b"v1-bytes"

    # publish direction + idempotent re-put (atomic per-object PUT)
    remote.put(local, "published/balance_T9.zip")
    remote.put(local, "published/balance_T9.zip")
    got = client.get_object(
        Bucket="dock-bucket", Key="exports/published/balance_T9.zip"
    )["Body"].read()
    assert got == b"v1-bytes"


def test_moto_s3_drives_sensor_and_transfer(s3_remote, tmp_path):
    """The full landing flow (sense → transfer, REPORT:166-178) against
    the real boto3 marshalling; a re-run overwrites, leaving exactly
    one file and no temp debris."""
    remote, client = s3_remote
    client.put_object(
        Bucket="dock-bucket", Key="exports/upload/stmt_T9.zip",
        Body=b"zipbytes",
    )
    sensor = Sensor(remote=remote, path="upload", attempts=2)
    found = sensor.wait_for(lambda n: n.endswith(".zip"))
    landing = str(tmp_path / "landing")
    landed1 = transfer_to_landing(remote, found, landing)
    landed2 = transfer_to_landing(remote, found, landing)  # re-run
    assert landed1 == landed2
    assert open(landed1, "rb").read() == b"zipbytes"
    assert sorted(os.listdir(landing)) == [os.path.basename(landed1)]


# ---------------------------------------------------------------------------
# SftpRemote against a paramiko twin at the library seam
# ---------------------------------------------------------------------------
def _fake_paramiko(root: str, journal: list) -> types.ModuleType:
    """A paramiko module twin implementing exactly the surface
    SftpRemote touches: Transport((host, port)) → connect(username,
    password) → SFTPClient.from_transport → listdir/get. Files come
    from a local directory; every call is journaled so the test can
    assert the remote wired credentials and paths correctly."""
    mod = types.ModuleType("paramiko")

    class Transport:
        def __init__(self, addr):
            journal.append(("transport", tuple(addr)))
            self.addr = tuple(addr)
            self.auth = None

        def connect(self, username=None, password=None):
            journal.append(("connect", username, password))
            self.auth = (username, password)

    class SFTPClient:
        def __init__(self, transport):
            if transport.auth is None:
                raise RuntimeError("connect() before from_transport()")
            self._root = root

        @classmethod
        def from_transport(cls, transport):
            journal.append(("from_transport",))
            return cls(transport)

        def listdir(self, path):
            journal.append(("listdir", path))
            full = os.path.join(self._root, path.lstrip("/"))
            # paramiko returns names in arbitrary (inode) order; shuffle
            # deterministically so SftpRemote's sorted() is observable
            return list(reversed(os.listdir(full)))

        def get(self, remotepath, localpath):
            journal.append(("get", remotepath, localpath))
            with open(os.path.join(self._root, remotepath.lstrip("/")),
                      "rb") as src, open(localpath, "wb") as dst:
                dst.write(src.read())

    mod.Transport = Transport
    mod.SFTPClient = SFTPClient
    return mod


def test_sftp_remote_runs_real_code_against_paramiko_twin(
    tmp_path, monkeypatch
):
    up = tmp_path / "srv" / "upload"
    up.mkdir(parents=True)
    (up / "b.zip").write_bytes(b"bb")
    (up / "a.zip").write_bytes(b"aa")

    journal: list = []
    monkeypatch.setitem(
        sys.modules, "paramiko",
        _fake_paramiko(str(tmp_path / "srv"), journal),
    )
    from dock_financial_data_pipelines_spark.sources.transports import (
        SftpRemote,
    )

    remote = SftpRemote("sftp.dock.example", "svc", "pw", port=2222)
    # construction wired host/port and credentials through the stack
    assert ("transport", ("sftp.dock.example", 2222)) in journal
    assert ("connect", "svc", "pw") in journal

    # listdir: the remote sorts what the library returns unsorted
    assert remote.listdir("upload") == ["a.zip", "b.zip"]

    # fetch: parent dirs are created, bytes land intact
    local = str(tmp_path / "landing" / "deep" / "a.zip")
    remote.fetch("upload/a.zip", local)
    assert open(local, "rb").read() == b"aa"


def test_sftp_remote_drives_sensor_and_transfer(tmp_path, monkeypatch):
    """REPORT:166-178 parity: the same sense→transfer flow the engine
    ships for LocalDirRemote runs unchanged over SftpRemote."""
    up = tmp_path / "srv" / "upload"
    up.mkdir(parents=True)
    (up / "balance_T9.zip").write_bytes(b"zipbytes")

    monkeypatch.setitem(
        sys.modules, "paramiko", _fake_paramiko(str(tmp_path / "srv"), []),
    )
    from dock_financial_data_pipelines_spark.sources.transports import (
        SftpRemote,
    )

    remote = SftpRemote("sftp.dock.example", "svc", "pw")
    sensor = Sensor(remote=remote, path="upload", attempts=2)
    found = sensor.wait_for(lambda n: n.endswith(".zip"))
    landed = transfer_to_landing(remote, found, str(tmp_path / "landing"))
    assert open(landed, "rb").read() == b"zipbytes"

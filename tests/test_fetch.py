"""Artifact fetch CLI (satlas_sr_tpu/fetch.py) against a local HTTP server.

No egress: a Range-capable in-process HTTP server stands in for the R2
buckets the reference README links to (README.md:33-87), exercising the
resume, retry, verification, and safe-extraction paths for real.
"""

import io
import os
import tarfile
import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

import pytest

from satlas_sr_tpu import fetch
from satlas_sr_tpu.fetch import (REGISTRY, download, fetch_artifact, main,
                                 safe_extract_tar, sha256_file)


class _Handler(BaseHTTPRequestHandler):
    """Serves self.server.files {path: bytes}; honors Range unless
    self.server.ignore_range; records request headers."""

    def do_GET(self):
        srv = self.server
        srv.requests.append(dict(self.headers))
        body = srv.files.get(self.path.split("?")[0])
        if body is None:
            self.send_error(404)
            return
        rng = self.headers.get("Range")
        if rng and not srv.ignore_range:
            start = int(rng.split("=")[1].rstrip("-"))
            if start >= len(body):  # real servers: Range Not Satisfiable
                self.send_error(416)
                return
            part = body[start:]
            self.send_response(206)
            self.send_header("Content-Range",
                             f"bytes {start}-{len(body) - 1}/{len(body)}")
        else:
            part = body
            self.send_response(200)
        if srv.lie_length:
            self.send_header("Content-Length", str(len(part) + srv.lie_length))
        else:
            self.send_header("Content-Length", str(len(part)))
        self.end_headers()
        try:
            self.wfile.write(part)
        except BrokenPipeError:
            pass

    def log_message(self, *a):
        pass


@pytest.fixture
def http_server():
    srv = ThreadingHTTPServer(("127.0.0.1", 0), _Handler)
    srv.files = {}
    srv.requests = []
    srv.ignore_range = False
    srv.lie_length = 0
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    yield srv
    srv.shutdown()
    srv.server_close()


def _url(srv, path):
    return f"http://127.0.0.1:{srv.server_address[1]}{path}"


# ---------------------------------------------------------------- download


def test_download_full_and_skip_when_complete(http_server, tmp_path):
    body = os.urandom(300_000)
    http_server.files["/a.bin"] = body
    dest = str(tmp_path / "a.bin")
    out = download(_url(http_server, "/a.bin"), dest, progress=False)
    assert out == dest
    assert open(dest, "rb").read() == body
    n_req = len(http_server.requests)
    # complete file short-circuits: no second request
    download(_url(http_server, "/a.bin"), dest, progress=False)
    assert len(http_server.requests) == n_req


def test_download_resumes_from_part_file(http_server, tmp_path):
    body = os.urandom(200_000)
    http_server.files["/b.bin"] = body
    dest = str(tmp_path / "b.bin")
    with open(dest + ".part", "wb") as f:
        f.write(body[:77_000])  # a previously-interrupted transfer
    download(_url(http_server, "/b.bin"), dest, progress=False)
    assert open(dest, "rb").read() == body
    assert not os.path.exists(dest + ".part")
    assert http_server.requests[0].get("Range") == "bytes=77000-"


def test_download_restarts_when_server_ignores_range(http_server, tmp_path):
    body = os.urandom(120_000)
    http_server.files["/c.bin"] = body
    http_server.ignore_range = True
    dest = str(tmp_path / "c.bin")
    with open(dest + ".part", "wb") as f:
        f.write(b"\xff" * 50_000)  # stale bytes that must NOT survive
    download(_url(http_server, "/c.bin"), dest, progress=False)
    assert open(dest, "rb").read() == body


def test_download_short_read_retries_then_416_selfheals(http_server, tmp_path):
    """A server lying about Content-Length causes a short-read retry; the
    resume Range then gets 416 (part already holds the whole body) and the
    .part is promoted instead of retrying the same header forever."""
    body = b"x" * 1000
    http_server.files["/d.bin"] = body
    http_server.lie_length = 500  # Content-Length > body: first read is short
    dest = str(tmp_path / "d.bin")
    naps = []
    out = download(_url(http_server, "/d.bin"), dest, retries=2,
                   progress=False, _sleep=naps.append)
    assert len(naps) == 1  # slept between the two attempts
    assert open(out, "rb").read() == body
    assert not os.path.exists(dest + ".part")


def test_download_full_part_file_promoted_on_416(http_server, tmp_path):
    body = os.urandom(90_000)
    http_server.files["/e.bin"] = body
    dest = str(tmp_path / "e.bin")
    with open(dest + ".part", "wb") as f:
        f.write(body)  # killed between last write and the atomic rename
    download(_url(http_server, "/e.bin"), dest, retries=1, progress=False,
             _sleep=lambda s: None)
    assert open(dest, "rb").read() == body
    assert not os.path.exists(dest + ".part")


def test_download_404_raises_with_url_in_message(http_server, tmp_path):
    with pytest.raises(OSError, match="/missing.bin"):
        download(_url(http_server, "/missing.bin"), str(tmp_path / "m.bin"),
                 retries=1, progress=False, _sleep=lambda s: None)


# ------------------------------------------------------------- extraction


def _make_tar(members):  # {name: bytes} -> tar bytes
    buf = io.BytesIO()
    with tarfile.open(fileobj=buf, mode="w") as tf:
        for name, data in members.items():
            info = tarfile.TarInfo(name)
            info.size = len(data)
            tf.addfile(info, io.BytesIO(data))
    return buf.getvalue()


def test_safe_extract_tar_roundtrip(tmp_path):
    tar = tmp_path / "ok.tar"
    tar.write_bytes(_make_tar({"val_set/naip/chip1/img.png": b"png!",
                               "val_set/sentinel2/chip1/tci.png": b"tci!"}))
    out = tmp_path / "out"
    n = safe_extract_tar(str(tar), str(out))
    assert n == 2
    assert (out / "val_set/naip/chip1/img.png").read_bytes() == b"png!"


def test_safe_extract_tar_refuses_traversal(tmp_path):
    tar = tmp_path / "evil.tar"
    tar.write_bytes(_make_tar({"../evil.txt": b"pwn"}))
    with pytest.raises(ValueError, match="traversal"):
        safe_extract_tar(str(tar), str(tmp_path / "out"))
    assert not (tmp_path / "evil.txt").exists()


def test_safe_extract_tar_refuses_links(tmp_path):
    buf = io.BytesIO()
    with tarfile.open(fileobj=buf, mode="w") as tf:
        info = tarfile.TarInfo("link")
        info.type = tarfile.SYMTYPE
        info.linkname = "/etc/passwd"
        tf.addfile(info)
    tar = tmp_path / "link.tar"
    tar.write_bytes(buf.getvalue())
    with pytest.raises(ValueError, match="link member"):
        safe_extract_tar(str(tar), str(tmp_path / "out"))


# ---------------------------------------------------------- fetch_artifact


def test_fetch_artifact_downloads_and_extracts(http_server, tmp_path,
                                               monkeypatch):
    tar_bytes = _make_tar({"small_val_set/naip/c/img.png": b"hi"})
    http_server.files["/small_val.tar"] = tar_bytes
    monkeypatch.setitem(
        REGISTRY, "small_val_set",
        {"urls": [_url(http_server, "/small_val.tar")], "kind": "tar",
         "about": "test"})
    paths = fetch_artifact("small_val_set", str(tmp_path), progress=False)
    assert paths == [str(tmp_path / "small_val.tar")]
    assert (tmp_path / "small_val_set/naip/c/img.png").read_bytes() == b"hi"


def test_fetch_artifact_rerun_skips_extraction(http_server, tmp_path,
                                               monkeypatch, capsys):
    tar_bytes = _make_tar({"val_set/naip/c/img.png": b"v1"})
    http_server.files["/val.tar"] = tar_bytes
    monkeypatch.setitem(
        REGISTRY, "val_set",
        {"urls": [_url(http_server, "/val.tar")], "kind": "tar", "about": "t"})
    fetch_artifact("val_set", str(tmp_path), progress=False)
    extracted = tmp_path / "val_set/naip/c/img.png"
    assert extracted.read_bytes() == b"v1"
    extracted.write_bytes(b"user-modified")
    fetch_artifact("val_set", str(tmp_path), progress=False)  # rerun: O(1)
    assert extracted.read_bytes() == b"user-modified"  # NOT re-extracted
    assert "already extracted" in capsys.readouterr().out
    os.remove(str(tmp_path / "val.tar") + ".extracted")
    fetch_artifact("val_set", str(tmp_path), progress=False)  # forced
    assert extracted.read_bytes() == b"v1"


def test_fetch_artifact_presigned_url_keeps_clean_filename(http_server,
                                                           tmp_path,
                                                           monkeypatch):
    http_server.files["/esrgan_8S2.pth"] = b"weights"
    monkeypatch.setitem(
        REGISTRY, "esrgan_8S2",
        {"urls": ["https://unused.example/esrgan_8S2.pth"], "kind": "file",
         "about": "t"})
    signed = _url(http_server, "/esrgan_8S2.pth") + "?X-Sig=SECRETTOKEN"
    paths = fetch_artifact("esrgan_8S2", str(tmp_path), url=signed,
                           progress=False)
    assert paths == [str(tmp_path / "esrgan_8S2.pth")]  # query stripped
    assert (tmp_path / "esrgan_8S2.pth").read_bytes() == b"weights"
    assert not any("SECRETTOKEN" in n for n in os.listdir(tmp_path))


def test_fetch_artifact_sha256_mismatch(http_server, tmp_path, monkeypatch):
    http_server.files["/w.pth"] = b"weights"
    monkeypatch.setitem(
        REGISTRY, "esrgan_8S2",
        {"urls": [_url(http_server, "/w.pth")], "kind": "file", "about": "t"})
    with pytest.raises(ValueError, match="sha256 mismatch"):
        fetch_artifact("esrgan_8S2", str(tmp_path), sha256="0" * 64,
                       progress=False)
    good = sha256_file(str(tmp_path / "w.pth"))
    fetch_artifact("esrgan_8S2", str(tmp_path), sha256=good.upper(),
                   progress=False)  # case-insensitive digest accepted


def test_fetch_artifact_multipart(http_server, tmp_path, monkeypatch):
    for i in (1, 2):
        http_server.files[f"/t.7z.{i:03d}"] = f"part{i}".encode()
    monkeypatch.setitem(
        REGISTRY, "train_urban_set",
        {"urls": [_url(http_server, f"/t.7z.{i:03d}") for i in (1, 2)],
         "kind": "7z", "about": "t"})
    paths = fetch_artifact("train_urban_set", str(tmp_path), progress=False)
    assert [os.path.basename(p) for p in paths] == ["t.7z.001", "t.7z.002"]
    # multi-part refuses a single --url override
    with pytest.raises(ValueError, match="2-part"):
        fetch_artifact("train_urban_set", str(tmp_path),
                       url=_url(http_server, "/t.7z.001"))


def test_fetch_artifact_no_download(tmp_path, monkeypatch):
    monkeypatch.setitem(
        REGISTRY, "srcnn",
        {"urls": ["https://unreachable.example/srcnn.pth"], "kind": "file",
         "about": "t"})
    with pytest.raises(FileNotFoundError, match="mirror it in"):
        fetch_artifact("srcnn", str(tmp_path), no_download=True)
    (tmp_path / "srcnn.pth").write_bytes(b"w")
    assert fetch_artifact("srcnn", str(tmp_path), no_download=True) == [
        str(tmp_path / "srcnn.pth")]


def test_fetch_artifact_unknown_name(tmp_path):
    with pytest.raises(KeyError, match="unknown artifact"):
        fetch_artifact("nope", str(tmp_path))


# ------------------------------------------------------------------- CLI


def test_cli_list(capsys):
    assert main(["list"]) == 0
    out = capsys.readouterr().out
    for name in ("val_set", "esrgan_8S2", "train_urban_set", "highresnet"):
        assert name in out
    assert "[4 parts]" in out  # train_urban_set volume count surfaces


def test_cli_get(http_server, tmp_path, monkeypatch, capsys):
    http_server.files["/osm.json"] = b"{}"
    monkeypatch.setitem(
        REGISTRY, "osm_chips_to_masks",
        {"urls": [_url(http_server, "/osm.json")], "kind": "file",
         "about": "t"})
    rc = main(["get", "osm_chips_to_masks", "--dest", str(tmp_path)])
    assert rc == 0
    assert (tmp_path / "osm.json").read_bytes() == b"{}"
    # a failing artifact reports per-name and exits 1
    rc = main(["get", "bogus_name", "--dest", str(tmp_path)])
    assert rc == 1
    assert "unknown artifact" in capsys.readouterr().err


# ------------------------------------------------------------- registry


def test_registry_mirrors_reference_readme():
    # every artifact the reference README's Download/Model-Weights sections
    # name (README.md:33-87) resolves here, with https URLs throughout
    expected = {"train_urban_set", "train_full_set", "val_set",
                "small_val_set", "test_set", "old_naip",
                "train_tile_weights", "osm_chips_to_masks", "satlas_rrdbnet",
                "esrgan_1S2", "esrgan_2S2", "esrgan_4S2", "esrgan_8S2",
                "esrgan_16S2", "esrgan_10m", "esrgan_20m", "esrgan_60m",
                "srcnn", "highresnet"}
    assert set(REGISTRY) == expected
    for name, e in REGISTRY.items():
        assert e["kind"] in ("tar", "7z", "file"), name
        assert e["urls"] and all(u.startswith("https://") for u in e["urls"])
        assert e["about"]
    assert len(REGISTRY["train_urban_set"]["urls"]) == 4

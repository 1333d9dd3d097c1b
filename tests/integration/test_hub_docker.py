"""OCI registry-v2 executor hub (marie_tpu/hub_docker.py) against an
in-process fake registry — incl. the docker token-auth dance
(reference hubble/api.py + dockerauth.py)."""

import base64
import json
import threading
import uuid
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from urllib.parse import parse_qs, urlparse

import pytest

from marie_tpu.hub_docker import (
    RegistryAuthError,
    RegistryClient,
    pull_executor_image,
    push_executor_image,
)


class FakeRegistry(BaseHTTPRequestHandler):
    """registry v2 subset: blobs (HEAD/GET/POST upload/PUT), manifests,
    tags list, plus a token endpoint guarding everything."""

    blobs = {}
    manifests = {}
    uploads = {}
    require_auth = True
    good_token = "tok-" + uuid.uuid4().hex
    users = {"ci": "s3cret"}

    def _authed(self):
        if not self.require_auth:
            return True
        return self.headers.get("Authorization") == f"Bearer {self.good_token}"

    def _challenge(self):
        self.send_response(401)
        self.send_header(
            "WWW-Authenticate",
            f'Bearer realm="http://{self.server.server_address[0]}:'
            f'{self.server.server_address[1]}/token",'
            'service="fake-registry",scope="repository:*:push,pull"',
        )
        self.end_headers()

    def _json(self, payload, code=200):
        body = json.dumps(payload).encode()
        self.send_response(code)
        self.send_header("Content-Type", "application/json")
        self.send_header("Content-Length", str(len(body)))
        self.end_headers()
        self.wfile.write(body)

    def do_GET(self):
        url = urlparse(self.path)
        if url.path == "/token":
            auth = self.headers.get("Authorization", "")
            if not auth.startswith("Basic "):
                self._json({"errors": ["credentials required"]}, 401)
                return
            user, _, pw = (
                base64.b64decode(auth[6:]).decode().partition(":")
            )
            if self.users.get(user) != pw:
                self._json({"errors": ["bad credentials"]}, 403)
                return
            assert parse_qs(url.query).get("service") == ["fake-registry"]
            self._json({"token": self.good_token})
            return
        if not self._authed():
            self._challenge()
            return
        name, kind, ref = self._split(url.path)
        if kind == "blobs":
            data = self.blobs.get(ref)
            if data is None:
                self._json({"errors": ["blob unknown"]}, 404)
                return
            self.send_response(200)
            self.send_header("Content-Length", str(len(data)))
            self.end_headers()
            self.wfile.write(data)
            return
        if kind == "manifests":
            m = self.manifests.get((name, ref))
            if m is None:
                self._json({"errors": ["manifest unknown"]}, 404)
                return
            self._json(m)
            return
        if kind == "tags":
            tags = [t for (n, t) in self.manifests if n == name]
            self._json({"name": name, "tags": sorted(tags)})
            return
        self._json({"errors": ["not found"]}, 404)

    @staticmethod
    def _split(path):
        """/v2/<name...>/<blobs|manifests|tags|uploads...>/<ref> with
        multi-segment repository names."""
        parts = path.strip("/").split("/")
        for i, p in enumerate(parts):
            if p in ("blobs", "manifests", "tags"):
                name = "/".join(parts[1:i])
                ref = parts[i + 1] if len(parts) > i + 1 else ""
                return name, p, ref
        return "/".join(parts[1:]), "", ""

    def do_HEAD(self):
        if not self._authed():
            self._challenge()
            return
        _, kind, ref = self._split(urlparse(self.path).path)
        code = 200 if (kind == "blobs" and ref in self.blobs) else 404
        self.send_response(code)
        self.end_headers()

    def do_POST(self):
        if not self._authed():
            self._challenge()
            return
        name, kind, ref = self._split(urlparse(self.path).path)
        if kind == "blobs" and ref == "uploads":
            uid = uuid.uuid4().hex
            self.send_response(202)
            self.send_header("Location", f"/v2/{name}/blobs/uploads/{uid}")
            self.end_headers()
            return
        self.send_response(404)
        self.end_headers()

    def do_PUT(self):
        if not self._authed():
            self._challenge()
            return
        url = urlparse(self.path)
        name, kind, ref = self._split(url.path)
        length = int(self.headers.get("Content-Length", 0))
        body = self.rfile.read(length)
        if kind == "blobs":  # upload session PUT ?digest=
            digest = parse_qs(url.query)["digest"][0]
            import hashlib

            if "sha256:" + hashlib.sha256(body).hexdigest() != digest:
                self._json({"errors": ["digest mismatch"]}, 400)
                return
            self.blobs[digest] = body
            self.send_response(201)
            self.end_headers()
            return
        if kind == "manifests":
            self.manifests[(name, ref)] = json.loads(body)
            self.send_response(201)
            self.end_headers()
            return
        self.send_response(404)
        self.end_headers()

    def log_message(self, *a):
        pass


@pytest.fixture
def registry():
    FakeRegistry.blobs = {}
    FakeRegistry.manifests = {}
    FakeRegistry.require_auth = True
    srv = ThreadingHTTPServer(("127.0.0.1", 0), FakeRegistry)
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    yield f"http://127.0.0.1:{srv.server_address[1]}"
    srv.shutdown()


def _bundle(tmp_path):
    b = tmp_path / "bundle"
    (b / "exec").mkdir(parents=True)
    (b / "config.yml").write_text("jtype: BaseExecutor\n")
    (b / "exec" / "app.py").write_text("print('executor')\n")
    return str(b)


def test_push_pull_round_trip_with_auth(registry, tmp_path):
    client = RegistryClient(registry, username="ci", password="s3cret")
    digest, manifest = push_executor_image(
        client, _bundle(tmp_path), "marie/extract", tag="1.0.0",
        labels={"version": "1.0.0"},
    )
    assert digest.startswith("sha256:")
    assert client.tags("marie/extract") == ["1.0.0"]

    dest = tmp_path / "pulled"
    pull_executor_image(
        RegistryClient(registry, username="ci", password="s3cret"),
        "marie/extract", "1.0.0", str(dest),
    )
    assert (dest / "config.yml").read_text() == "jtype: BaseExecutor\n"
    assert (dest / "exec" / "app.py").exists()


def test_bad_credentials_rejected(registry, tmp_path):
    client = RegistryClient(registry, username="ci", password="wrong")
    with pytest.raises(RegistryAuthError):
        push_executor_image(client, _bundle(tmp_path), "marie/x")


def test_push_skips_existing_blobs(registry, tmp_path):
    client = RegistryClient(registry, username="ci", password="s3cret")
    bundle = _bundle(tmp_path)
    d1, m1 = push_executor_image(client, bundle, "marie/extract", "1.0.0")
    n_blobs = len(FakeRegistry.blobs)
    d2, m2 = push_executor_image(client, bundle, "marie/extract", "1.0.1")
    # deterministic layer + config: re-push adds no new blobs
    assert len(FakeRegistry.blobs) == n_blobs
    assert m1["layers"] == m2["layers"]


def test_pull_rejects_traversal(registry, tmp_path):
    import gzip
    import hashlib
    import io
    import tarfile

    client = RegistryClient(registry, username="ci", password="s3cret")
    # hand-build a malicious layer
    buf = io.BytesIO()
    with tarfile.open(fileobj=buf, mode="w") as tar:
        info = tarfile.TarInfo("../../evil.txt")
        info.size = 4
        tar.addfile(info, io.BytesIO(b"boom"))
    layer = gzip.compress(buf.getvalue(), mtime=0)
    digest = "sha256:" + hashlib.sha256(layer).hexdigest()
    client.push_blob("marie/evil", layer)
    client.push_manifest(
        "marie/evil", "1", {
            "schemaVersion": 2,
            "layers": [{"digest": digest, "size": len(layer)}],
        },
    )
    with pytest.raises(RuntimeError, match="escapes"):
        pull_executor_image(client, "marie/evil", "1", str(tmp_path / "out"))

"""TUI console render layer (marie_tpu_server/ctl.py) — pure
state->lines functions tested headless, plus a live fetch_snapshot
against a fake control-plane HTTP server."""

import json
import threading
import time
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

from marie_tpu_server.ctl import (
    Snapshot,
    fetch_snapshot,
    render_dashboard,
    render_help,
    render_result,
)

JOBS = [
    {"id": "a" * 32, "name": "extract", "state": "completed",
     "created_on": 1767000000.0, "output": {"pages": 3}},
    {"id": "b" * 32, "name": "classify", "state": "active",
     "created_on": 1767000100.0},
]


def _snap():
    return Snapshot(
        ok=True,
        gateway="127.0.0.1:51000",
        deployments={"extract_t": ["h:1", "h:2"]},
        jobs=list(JOBS),
        events=[{"event": "started", "jobid": "a" * 32}],
        fetched_at=time.time(),
    )


def test_dashboard_renders_fixed_geometry():
    lines = render_dashboard(_snap(), w=80, h=24, selected=1, server="x:1")
    assert len(lines) == 24
    assert all(len(ln) == 80 for ln in lines)
    assert any("gateway" in ln for ln in lines)
    assert any("extract_t" in ln and "replicas=2" in ln for ln in lines)
    # selection marker on the second job
    marked = [ln for ln in lines if ln.startswith(">")]
    assert len(marked) == 1 and "b" * 8 in marked[0]
    assert any("started" in ln for ln in lines)


def test_dashboard_unreachable():
    snap = Snapshot(ok=False, error="ConnectionRefusedError()")
    lines = render_dashboard(snap, w=60, h=10, selected=0, server="x:1")
    assert any("unreachable" in ln for ln in lines)
    assert len(lines) == 10


def test_result_viewer_scrolls():
    job = JOBS[0]
    top = render_result(job, w=60, h=8, scroll=0)
    assert any("output" in ln for ln in render_result(job, 60, 30, 0))
    shifted = render_result(job, w=60, h=8, scroll=3)
    assert top != shifted
    assert len(top) == 8 and all(len(ln) == 60 for ln in top)


def test_help_lists_all_bindings():
    lines = render_help(w=50, h=20)
    body = "\n".join(lines)
    for key in ("q", "enter", "esc", "?"):
        assert key in body


def test_fetch_snapshot_live():
    class Handler(BaseHTTPRequestHandler):
        def do_GET(self):
            payload = {
                "/api/nodes": {"gateway": "g:1",
                               "deployments": {"d": ["a:1"]}},
                "/api/jobs": JOBS,
                "/api/events/recent": [],
            }.get(self.path)
            if payload is None:
                self.send_response(404)
                self.end_headers()
                return
            body = json.dumps(payload).encode()
            self.send_response(200)
            self.send_header("Content-Type", "application/json")
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def log_message(self, *a):
            pass

    srv = ThreadingHTTPServer(("127.0.0.1", 0), Handler)
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    try:
        snap = fetch_snapshot(f"http://127.0.0.1:{srv.server_address[1]}")
        assert snap.ok and snap.gateway == "g:1"
        assert [j["name"] for j in snap.jobs] == ["extract", "classify"]
    finally:
        srv.shutdown()

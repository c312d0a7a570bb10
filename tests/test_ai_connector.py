"""Generative-replace connector tests against a loopback dummy middleware."""

import base64
import io
import json
import threading
from http.server import BaseHTTPRequestHandler, HTTPServer

import numpy as np
from PIL import Image

from rapidraw_tpu.ai.connector import check_status, generate_source_id, process_inpainting


class _Middleware(BaseHTTPRequestHandler):
    sources: set = set()

    def log_message(self, *a):
        pass

    def do_GET(self):
        if self.path == "/health":
            self.send_response(200)
            self.end_headers()
            self.wfile.write(b"ok")
        else:
            self.send_response(404)
            self.end_headers()

    def do_POST(self):
        length = int(self.headers.get("Content-Length", 0))
        body = self.rfile.read(length)
        if self.path == "/upload_source":
            assert b"source.jpg" in body
            sid = body.split(b'name="source_id"\r\n\r\n')[1].split(b"\r\n")[0]
            _Middleware.sources.add(sid.decode())
            self.send_response(200)
            self.end_headers()
            self.wfile.write(b"{}")
            return
        if self.path == "/inpaint":
            payload = json.loads(body)
            if payload["source_id"] not in _Middleware.sources:
                self.send_response(404)
                self.end_headers()
                return
            crop = Image.new("RGBA", (8, 6), (255, 0, 0, 255))
            buf = io.BytesIO()
            crop.save(buf, format="PNG")
            resp = {"x": 4, "y": 2, "color": base64.b64encode(buf.getvalue()).decode()}
            self.send_response(200)
            self.send_header("Content-Type", "application/json")
            self.end_headers()
            self.wfile.write(json.dumps(resp).encode())
            return
        self.send_response(404)
        self.end_headers()


def _serve():
    srv = HTTPServer(("127.0.0.1", 0), _Middleware)
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    return srv


def test_health_check_and_upload_retry(tmp_path):
    srv = _serve()
    addr = f"127.0.0.1:{srv.server_port}"
    assert check_status(addr)
    assert not check_status("127.0.0.1:1")  # nothing listening

    src = tmp_path / "s.jpg"
    Image.new("RGB", (32, 24)).save(src)
    img = np.zeros((3, 24, 32), np.float32)
    mask = np.zeros((24, 32), np.uint8)
    # first /inpaint 404s (unknown source) -> client uploads -> retry succeeds
    patch = process_inpainting(f"http://{addr}", str(src), img, mask, "a red box")
    assert patch.shape == (4, 24, 32)
    assert patch[0, 3, 5] == 255 and patch[3, 3, 5] == 255  # red, opaque
    assert patch[3, 0, 0] == 0  # transparent outside the crop
    assert generate_source_id(str(src)) in _Middleware.sources
    srv.shutdown()

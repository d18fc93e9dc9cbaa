#!/usr/bin/env python3
"""Minimal web GUI: live module posts as MJPEG streams + tuner sliders.

The reference's WebGUI is an external repo consuming ModuleReader
(SURVEY.md §1 L10); this built-in viewer closes the loop with zero extra
dependencies: a stdlib http.server serving

* ``/``                     — an index page listing active modules, their
                              post streams, and live tuner controls;
* ``/stream/<module>/<post>`` — multipart MJPEG of that post block;
* ``/tuner/<module>?name=&value=`` — POST target wired to
                              ModuleReader.update_tuner_value.
"""

from __future__ import annotations

import argparse
import json
import threading
import time
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from urllib.parse import parse_qs, unquote, urlparse

import numpy as np

from ..core.base import ModuleReader
from ..capture_sources.stream_server import encode_jpeg

_readers = {}
_lock = threading.Lock()
_latest = {}  # (module, post) -> jpeg bytes


def _reader_for(module: str) -> ModuleReader:
    with _lock:
        reader = _readers.get(module)
        if reader is not None and reader.framework_deleted:
            # the reader itself rediscovers new post/tune blocks; only a
            # torn-down module framework needs a rebuild
            reader.unblock()
            _readers.pop(module, None)
            reader = None
        if reader is None:
            reader = ModuleReader(module)

            def on_post(mod, name, idx, img, cs, _m=module):
                bgr = img if img.ndim == 3 else np.repeat(img[..., None] if img.ndim == 2 else img, 3, -1)
                if bgr.ndim == 3 and bgr.shape[-1] == 1:
                    bgr = np.repeat(bgr, 3, -1)
                _latest[(_m, name)] = encode_jpeg(
                    np.ascontiguousarray(bgr), quality=80
                )

            reader.register_post_udl(on_post)
            reader.run_forever(fps=30)
            _readers[module] = reader
        return reader


class Handler(BaseHTTPRequestHandler):
    def log_message(self, *args):
        pass

    def do_GET(self):
        url = urlparse(self.path)
        parts = [unquote(p) for p in url.path.strip("/").split("/") if p]
        if not parts:
            return self._index()
        if parts[0] == "stream" and len(parts) == 3:
            return self._stream(parts[1], parts[2])
        if parts[0] == "modules":
            return self._json(ModuleReader.get_active_modules())
        self.send_error(404)

    def do_POST(self):
        url = urlparse(self.path)
        parts = [unquote(p) for p in url.path.strip("/").split("/") if p]
        if parts and parts[0] == "tuner" and len(parts) == 2:
            q = parse_qs(url.query)
            name = q.get("name", [""])[0]
            value = q.get("value", [""])[0]
            reader = _reader_for(parts[1])
            tuner = reader._all_tuners[name][2]
            cast = type(tuner.value)
            reader.update_tuner_value(
                name, cast(float(value)) if cast is not bool else value == "true"
            )
            return self._json({"ok": True})
        self.send_error(404)

    def _json(self, payload):
        body = json.dumps(payload).encode()
        self.send_response(200)
        self.send_header("Content-Type", "application/json")
        self.send_header("Content-Length", str(len(body)))
        self.end_headers()
        self.wfile.write(body)

    def _index(self):
        rows = []
        for module in sorted(ModuleReader.get_active_modules()):
            reader = _reader_for(module)
            posts = sorted(reader._all_posts)
            tuners = {
                name: reader._all_tuners[name][2].value
                for name in sorted(reader._all_tuners)
            }
            streams = "".join(
                f'<figure><img src="/stream/{module}/{p}" width=480>'
                f"<figcaption>{p}</figcaption></figure>"
                for p in posts
            )
            sliders = "".join(
                f'<label>{n}: <input type="number" value="{v}" '
                f"onchange=\"fetch('/tuner/{module}?name={n}&value='+this.value,"
                f"{{method:'POST'}})\"></label><br>"
                for n, v in tuners.items()
            )
            rows.append(
                f"<h2>{module}</h2><div style='display:flex;flex-wrap:wrap'>"
                f"{streams}</div><h3>tuners</h3>{sliders}"
            )
        body = (
            "<html><head><title>vision</title></head><body>"
            "<h1>tpu-vision-pipeline</h1>" + "".join(rows) + "</body></html>"
        ).encode()
        self.send_response(200)
        self.send_header("Content-Type", "text/html")
        self.send_header("Content-Length", str(len(body)))
        self.end_headers()
        self.wfile.write(body)

    def _stream(self, module: str, post: str):
        _reader_for(module)
        self.send_response(200)
        self.send_header(
            "Content-Type", "multipart/x-mixed-replace; boundary=frame"
        )
        self.end_headers()
        try:
            while True:
                jpeg = _latest.get((module, post))
                if jpeg is not None:
                    self.wfile.write(b"--frame\r\n")
                    self.wfile.write(b"Content-Type: image/jpeg\r\n")
                    self.wfile.write(
                        f"Content-Length: {len(jpeg)}\r\n\r\n".encode()
                    )
                    self.wfile.write(jpeg)
                    self.wfile.write(b"\r\n")
                time.sleep(1 / 30)
        except (BrokenPipeError, ConnectionResetError):
            pass


def main(argv=None) -> None:
    parser = argparse.ArgumentParser(description="live module post viewer")
    parser.add_argument("--port", type=int, default=8080)
    args = parser.parse_args(argv)
    server = ThreadingHTTPServer(("0.0.0.0", args.port), Handler)
    print(f"web viewer on http://0.0.0.0:{args.port}")
    server.serve_forever()


if __name__ == "__main__":
    main()

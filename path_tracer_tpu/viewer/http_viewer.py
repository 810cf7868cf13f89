"""Tiny threaded HTTP progressive viewer (display-server-free).

Serves an auto-refreshing page with the latest render; the driver calls
``update(image_u8)`` after every sample pass — the role of the reference's
per-pixel mpsc channel + SFML loop (ref: src/renderer/viewer.rs:39-101,
fed at src/renderer/mod.rs:133-141 with the tonemapped running average).
"""
from __future__ import annotations

import io
import threading

import numpy as np

_PAGE = b"""<!doctype html><html><head><title>path-tracer-tpu</title></head>
<body style="margin:0;background:#111;display:flex;justify-content:center">
<img id="im" style="image-rendering:pixelated;max-width:100%"/>
<script>
const im = document.getElementById('im');
setInterval(() => { im.src = '/frame.png?' + Date.now(); }, 250);
</script></body></html>"""


class ProgressiveViewer:
    def __init__(self, resolution, port: int = 8642):
        self._lock = threading.Lock()
        self._png: bytes = b""
        self._server = None
        self.url = None
        try:
            self._start_server(port)
        except OSError as e:
            import warnings

            warnings.warn(
                f"viewer could not bind port {port} ({e}); falling back to "
                "writing preview.png per pass", stacklevel=2)
            self._server = None

    def _start_server(self, port: int):
        from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

        viewer = self

        class Handler(BaseHTTPRequestHandler):
            def do_GET(self):  # noqa: N802
                if self.path.startswith("/frame.png"):
                    with viewer._lock:
                        body = viewer._png
                    self.send_response(200 if body else 404)
                    self.send_header("Content-Type", "image/png")
                    self.end_headers()
                    self.wfile.write(body)
                else:
                    self.send_response(200)
                    self.send_header("Content-Type", "text/html")
                    self.end_headers()
                    self.wfile.write(_PAGE)

            def log_message(self, *a):  # silence request logging
                pass

        self._server = ThreadingHTTPServer(("127.0.0.1", port), Handler)
        self.url = f"http://127.0.0.1:{self._server.server_address[1]}/"
        t = threading.Thread(target=self._server.serve_forever, daemon=True)
        t.start()
        print(f"Viewer: {self.url}")

    def update(self, image_u8: np.ndarray) -> None:
        """Push the latest tonemapped frame ([H,W,3] uint8)."""
        from PIL import Image

        buf = io.BytesIO()
        Image.fromarray(np.asarray(image_u8, np.uint8), "RGB").save(buf, "PNG")
        png = buf.getvalue()
        if self._server is not None:
            with self._lock:
                self._png = png
        else:
            with open("preview.png", "wb") as f:
                f.write(png)

    def close(self) -> None:
        if self._server is not None:
            self._server.shutdown()
            self._server = None

"""Live training viewer (stdlib HTTP, zero dependencies).

The reference trains with the nerfstudio viewer on by default
(dn_config.py:69-70), giving live renders + stats in the browser. This
is the self-contained analogue: a daemon-thread HTTP server that serves

  /            one-page dashboard (auto-refreshing render + metric table)
  /rgb.png     latest posted render (also /depth.png, /normal.png)
  /stats.json  latest metric dict

The trainer posts images/metrics via `update()`; nothing here touches
the training loop's device work (encoding happens on the caller's host
thread only when a viewer is attached).
"""

from __future__ import annotations

import io as _io
import json
import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from typing import Dict, Optional

import numpy as np

_PAGE = """<!DOCTYPE html>
<html><head><title>dnsplatter_tpu viewer</title><style>
body{font-family:monospace;background:#111;color:#ddd;margin:20px}
img{image-rendering:pixelated;border:1px solid #444;max-width:45vw}
table{border-collapse:collapse;margin-top:12px}
td{padding:2px 10px;border:1px solid #333}
</style></head><body>
<h3>dnsplatter_tpu live viewer</h3>
<div><img id="rgb" src="/rgb.png"/> <img id="depth" src="/depth.png"/></div>
<table id="stats"></table>
<script>
async function tick(){
  try{
    const r = await fetch('/stats.json'); const s = await r.json();
    const t = document.getElementById('stats');
    t.innerHTML = Object.entries(s).map(
      ([k,v])=>`<tr><td>${k}</td><td>${typeof v==='number'?v.toFixed(5):v}</td></tr>`
    ).join('');
    for (const id of ['rgb','depth']){
      document.getElementById(id).src = '/'+id+'.png?t='+Date.now();
    }
  }catch(e){}
  setTimeout(tick, 2000);
}
tick();
</script></body></html>"""


class ViewerState:
    def __init__(self):
        self.lock = threading.Lock()
        self.images: Dict[str, bytes] = {}
        self.stats: Dict[str, float] = {}

    def update(self, stats: Optional[Dict] = None,
               images: Optional[Dict[str, np.ndarray]] = None) -> None:
        """Post new metrics and/or (H, W, 3|1) float [0,1] images."""
        with self.lock:
            if stats:
                self.stats.update({
                    k: (float(v) if isinstance(v, (int, float, np.floating, np.integer))
                        else str(v))
                    for k, v in stats.items()
                })
            if images:
                for name, arr in images.items():
                    self.images[name] = _encode_png(arr)


def _encode_png(arr: np.ndarray) -> bytes:
    from PIL import Image

    a = np.asarray(arr)
    if a.ndim == 3 and a.shape[-1] == 1:
        a = a[..., 0]
    if a.ndim == 2:  # depth: normalize for display
        a = np.nan_to_num(a, nan=0.0, posinf=0.0, neginf=0.0)
        lo, hi = float(a.min()), float(a.max())
        a = (a - lo) / max(hi - lo, 1e-9)
        a = np.stack([a] * 3, -1)
    buf = _io.BytesIO()
    Image.fromarray(
        (np.clip(a, 0, 1) * 255).astype(np.uint8)
    ).save(buf, format="PNG")
    return buf.getvalue()


class Viewer:
    """viewer = Viewer(port); viewer.update(stats=..., images=...)"""

    def __init__(self, port: int = 7007, host: str = "127.0.0.1"):
        state = ViewerState()
        self.state = state

        class Handler(BaseHTTPRequestHandler):
            def log_message(self, *a):  # silence request logging
                pass

            def do_GET(self):
                path = self.path.split("?")[0]
                if path == "/" or path == "/index.html":
                    body = _PAGE.encode()
                    ctype = "text/html"
                elif path == "/stats.json":
                    with state.lock:
                        body = json.dumps(state.stats).encode()
                    ctype = "application/json"
                elif path.endswith(".png"):
                    name = path[1:-4]
                    with state.lock:
                        body = state.images.get(name)
                    if body is None:
                        self.send_response(404)
                        self.end_headers()
                        return
                    ctype = "image/png"
                else:
                    self.send_response(404)
                    self.end_headers()
                    return
                self.send_response(200)
                self.send_header("Content-Type", ctype)
                self.send_header("Content-Length", str(len(body)))
                self.send_header("Cache-Control", "no-store")
                self.end_headers()
                self.wfile.write(body)

        self.server = ThreadingHTTPServer((host, port), Handler)
        self.port = self.server.server_address[1]
        self.thread = threading.Thread(
            target=self.server.serve_forever, daemon=True
        )
        self.thread.start()

    def update(self, stats=None, images=None) -> None:
        self.state.update(stats=stats, images=images)

    def close(self) -> None:
        self.server.shutdown()
        self.server.server_close()

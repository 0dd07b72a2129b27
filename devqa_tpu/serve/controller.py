"""Controller — worker registry + dispatch.

Counterpart of the reference's serving controller
(``easyeditor/trainer/mPLUG_Owl2/serve/controller.py:57-239``: worker
registration, heartbeat expiry, shortest-queue/lottery dispatch). Stdlib
HTTP; endpoints:

  POST /register_worker {"name", "url"}
  GET  /list_workers
  POST /generate {...}      → proxied to a worker (round-robin)
"""
from __future__ import annotations

import itertools
import json
import threading
import time
import urllib.request
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from typing import Dict, Optional


class Controller:
    def __init__(self, heartbeat_expiry: float = 90.0):
        self.workers: Dict[str, Dict] = {}
        self.heartbeat_expiry = heartbeat_expiry
        self._rr = itertools.count()
        self._httpd: Optional[ThreadingHTTPServer] = None

    def register(self, name: str, url: str):
        self.workers[name] = {"url": url, "last_seen": time.time()}

    def alive_workers(self):
        now = time.time()
        return {n: w for n, w in self.workers.items()
                if now - w["last_seen"] < self.heartbeat_expiry}

    def pick(self) -> Optional[str]:
        alive = sorted(self.alive_workers())
        if not alive:
            return None
        return alive[next(self._rr) % len(alive)]

    def proxy(self, name: str, path: str, body: dict) -> dict:
        url = self.workers[name]["url"].rstrip("/") + path
        req = urllib.request.Request(
            url, data=json.dumps(body).encode(),
            headers={"Content-Type": "application/json"})
        with urllib.request.urlopen(req, timeout=600) as r:
            return json.loads(r.read())

    def handle(self, path: str, body: dict) -> dict:
        if path == "/register_worker":
            self.register(body["name"], body["url"])
            return {"ok": True}
        if path == "/list_workers":
            return {"workers": sorted(self.alive_workers())}
        if path == "/generate":
            name = self.pick()
            if name is None:
                return {"error": "no live workers"}
            return self.proxy(name, path, body)
        if path in ("/edit", "/restore"):
            # Edits are MODEL STATE: broadcast to every live worker.
            # Round-robin here would apply the edit to one worker while
            # subsequent /generate calls rotate onto unedited ones.
            alive = sorted(self.alive_workers())
            if not alive:
                return {"error": "no live workers"}
            results = {}
            for n in alive:
                try:
                    results[n] = self.proxy(n, path, body)
                except Exception as e:  # dead mid-broadcast
                    results[n] = {"error": repr(e)}
            ok = all(r.get("ok") for r in results.values())
            return {"ok": ok, "workers": results}
        return {"error": "unknown endpoint %s" % path}

    def serve(self, host: str = "127.0.0.1", port: int = 21001,
              background: bool = False):
        ctl = self

        class Handler(BaseHTTPRequestHandler):
            def log_message(self, *a):
                pass

            def _respond(self, payload):
                data = json.dumps(payload).encode()
                self.send_response(200)
                self.send_header("Content-Type", "application/json")
                self.send_header("Content-Length", str(len(data)))
                self.end_headers()
                self.wfile.write(data)

            def do_GET(self):
                self._respond(ctl.handle(self.path, {}))

            def do_POST(self):
                n = int(self.headers.get("Content-Length", 0))
                body = json.loads(self.rfile.read(n) or b"{}")
                self._respond(ctl.handle(self.path, body))

        self._httpd = ThreadingHTTPServer((host, port), Handler)
        if background:
            threading.Thread(target=self._httpd.serve_forever,
                             daemon=True).start()
            return self._httpd
        self._httpd.serve_forever()

    def shutdown(self):
        if self._httpd is not None:
            self._httpd.shutdown()

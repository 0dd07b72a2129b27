"""Web chat server — the reference's gradio web server role
(``mPLUG_Owl2/serve/gradio_web_server.py``: a browser chat UI that lists
models from the controller and proxies chat turns to workers).

Gradio isn't in this image; the same role is a stdlib-HTTP server that
serves one self-contained HTML page and two JSON endpoints:

  GET  /            → the chat page
  GET  /models      → {"workers": [...]} (controller /list_workers)
  POST /chat        {"prompt","image"?,"template"?,"max_new_tokens"?}
                    → {"text": ...} (proxied /generate, optionally
                       wrapped in a conversation template)

Run: ``python -m devqa_tpu.serve.web --controller http://127.0.0.1:21001``.
"""
from __future__ import annotations

import argparse
import json
import threading
import urllib.request
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from typing import Optional

from .templates import CONV_TEMPLATES

PAGE = """<!doctype html>
<html><head><title>devqa_tpu chat</title><style>
body{font-family:sans-serif;max-width:720px;margin:2em auto}
#log{border:1px solid #ccc;min-height:200px;padding:8px;white-space:pre-wrap}
input,select{margin:4px 0}#prompt{width:70%}
</style></head><body>
<h3>devqa_tpu chat</h3>
<div id="log"></div>
<input id="prompt" placeholder="message"/>
<select id="template"><option>none</option><option>v0</option>
<option>v1</option><option>mplug_owl2</option></select>
<input id="image" placeholder="image path (optional)"/>
<button onclick="send()">send</button>
<script>
async function send(){
  const p=document.getElementById('prompt').value;
  const t=document.getElementById('template').value;
  const i=document.getElementById('image').value||null;
  const log=document.getElementById('log');
  log.textContent+='\\nYOU: '+p;
  const r=await fetch('/chat',{method:'POST',
    headers:{'Content-Type':'application/json'},
    body:JSON.stringify({prompt:p,template:t,image:i})});
  const j=await r.json();
  log.textContent+='\\nBOT: '+(j.text??JSON.stringify(j));
  document.getElementById('prompt').value='';
}
</script></body></html>"""


class WebServer:
    def __init__(self, controller_url: str, max_new_tokens: int = 16):
        self.controller_url = controller_url.rstrip("/")
        self.max_new_tokens = max_new_tokens
        self._httpd: Optional[ThreadingHTTPServer] = None

    def _post_controller(self, path: str, body: dict) -> dict:
        req = urllib.request.Request(
            self.controller_url + path, data=json.dumps(body).encode(),
            headers={"Content-Type": "application/json"})
        with urllib.request.urlopen(req, timeout=600) as r:
            return json.loads(r.read())

    def chat(self, body: dict) -> dict:
        conv = CONV_TEMPLATES.get(body.get("template") or "none")
        prompt = body["prompt"]
        if conv is not None:
            prompt = conv.wrap(prompt)
        return self._post_controller("/generate", {
            "prompt": prompt, "image": body.get("image"),
            "max_new_tokens": int(body.get("max_new_tokens",
                                           self.max_new_tokens))})

    def serve(self, host: str = "127.0.0.1", port: int = 21003,
              background: bool = False):
        web = self

        class Handler(BaseHTTPRequestHandler):
            def log_message(self, *a):
                pass

            def _respond(self, data: bytes, ctype: str):
                self.send_response(200)
                self.send_header("Content-Type", ctype)
                self.send_header("Content-Length", str(len(data)))
                self.end_headers()
                self.wfile.write(data)

            def do_GET(self):
                if self.path == "/models":
                    out = web._post_controller("/list_workers", {})
                    self._respond(json.dumps(out).encode(),
                                  "application/json")
                else:
                    self._respond(PAGE.encode(), "text/html")

            def do_POST(self):
                n = int(self.headers.get("Content-Length", 0))
                body = json.loads(self.rfile.read(n) or b"{}")
                if self.path == "/chat":
                    out = web.chat(body)
                else:
                    out = {"error": "unknown endpoint %s" % self.path}
                self._respond(json.dumps(out).encode(), "application/json")

        self._httpd = ThreadingHTTPServer((host, port), Handler)
        if background:
            t = threading.Thread(target=self._httpd.serve_forever,
                                 daemon=True)
            t.start()
            return self._httpd
        self._httpd.serve_forever()

    def shutdown(self):
        if self._httpd is not None:
            self._httpd.shutdown()


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--controller", default="http://127.0.0.1:21001")
    p.add_argument("--host", default="127.0.0.1")
    p.add_argument("--port", type=int, default=21003)
    args = p.parse_args(argv)
    print("web chat at http://%s:%d (controller %s)"
          % (args.host, args.port, args.controller))
    WebServer(args.controller).serve(args.host, args.port)


if __name__ == "__main__":
    main()

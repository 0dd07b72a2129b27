"""Model worker — the serving stack's inference node.

TPU-native counterpart of the mPLUG-Owl2 serving worker the reference
vendors (``easyeditor/trainer/mPLUG_Owl2/serve/model_worker.py:44`` —
FastAPI worker streaming generations, registered with a controller).
Stdlib HTTP (this image ships no fastapi); one worker owns one JaxVLLM
(+ optionally an editor) and serves:

  POST /generate        {"prompt": str, "image": path|null,
                         "max_new_tokens": int}       → {"text": ...}
  POST /edit            {"prompt","target_new","image"} → applies the edit
  POST /restore                                         → resets edits
  GET  /status                                          → worker metadata

Generation is greedy full-recompute decoding (the domain's answers are a
few tokens; prefix-cached decoding is a planned optimization).
"""
from __future__ import annotations

import json
import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from typing import Optional

import numpy as np


class ModelWorker:
    def __init__(self, vllm, editor=None, name: str = "worker",
                 batching: bool = False, n_slots: int = 4,
                 max_len: int = 160, steps_per_dispatch: int = 1):
        """``batching=True`` (editor-less, cacheable arch) serves
        /generate through a continuous-batching engine (serve/engine.py):
        concurrent requests share decode slots instead of serializing on
        the model lock."""
        self.vllm = vllm
        self.editor = editor
        self.name = name
        self._lock = threading.Lock()
        self._httpd: Optional[ThreadingHTTPServer] = None
        self._engine = None
        if batching and editor is None:
            from .engine import BatchingEngine

            self._engine = BatchingEngine(
                vllm, n_slots=n_slots, max_len=max_len,
                steps_per_dispatch=steps_per_dispatch).start()

    # ---------------- controller registration ----------------

    def register_with(self, controller_url: str, my_url: str,
                      heartbeat_interval: float = 30.0):
        """Register with a controller and keep re-registering on a daemon
        heartbeat thread (model_worker.py:44's heartbeat loop role). The
        controller expires workers ``heartbeat_expiry`` (default 90s)
        after their last registration — a register-once worker would be
        dropped from dispatch while perfectly healthy."""
        import urllib.request

        def beat_once():
            body = json.dumps({"name": self.name, "url": my_url}).encode()
            req = urllib.request.Request(
                controller_url.rstrip("/") + "/register_worker", data=body,
                headers={"Content-Type": "application/json"})
            urllib.request.urlopen(req, timeout=30).read()

        beat_once()  # fail loudly on first contact

        stop = threading.Event()

        def loop():
            while not stop.wait(heartbeat_interval):
                try:
                    beat_once()
                except Exception:
                    pass  # controller restart — keep beating

        self._heartbeat_stop = stop
        threading.Thread(target=loop, daemon=True).start()

    # ---------------- inference ----------------

    def generate(self, prompt: str, image: Optional[str] = None,
                 max_new_tokens: int = 10) -> str:
        """Greedy decode; edits apply through the attached editor's
        query_logits.

        The query is encoded through ``editor.build_query_batch`` (empty
        target) so prompt-keyed editors (LTE/RECIPE retrieval, IKE ICL
        prefixes) see the real serving prompt instead of whatever batch
        the harness encoded last. The next-token logit is read at the last
        real *text* position: in the slotted layout
        [text[:p] | V vision slots | text[p:]] the valid-count is NOT the
        last-token index for text-only requests (vision slots are masked
        mid-sequence), so we map the text index through the slot offset.

        Without an editor, decoding is KV-cached: one prefill + one
        compiled single-token step whose latency is independent of the
        generated length (model_worker.py:44 streaming semantics;
        cached == full-recompute asserted in tests/test_kv_cache.py).
        Editor-intervened decoding stays full-recompute — interventions
        are defined on whole-sequence forwards.
        """
        vllm = self.vllm
        if self._engine is not None:
            return self._engine.generate(prompt, image, max_new_tokens)
        with self._lock:
            if (self.editor is None
                    and vllm.cfg.decoder.arch in ("opt", "llama")):
                return self._generate_cached(prompt, image, max_new_tokens)
            out_ids: list = []
            text = prompt
            for _ in range(max_new_tokens):
                if self.editor is not None:
                    qb = self.editor.build_query_batch([text], [image], [""])
                    logits = self.editor.query_logits(qb)
                else:
                    qb = vllm.encode_queries([text], [image], [""])
                    logits = vllm.logits(qb.embeds, qb.kv_valid)
                nxt = int(np.argmax(
                    np.asarray(logits)[0, self._last_text_pos(qb)]))
                if nxt in (vllm.tokenizer.pad_token_id,
                           getattr(vllm.tokenizer, "eos_token_id", -1)):
                    break
                out_ids.append(nxt)
                text = prompt + vllm.tokenizer.decode(out_ids)
            return vllm.tokenizer.decode(out_ids)

    def _last_text_pos(self, qb) -> int:
        V, p = self.vllm.cfg.n_img_tokens, self.vllm.cfg.img_slot_pos
        li = int(qb.prompt_lens[0]) - 1  # last text-token index
        return li + V if li >= p else li

    def _cached_token_ids(self, prompt, image, max_new_tokens: int):
        """Greedy token-id generator over the KV cache."""
        vllm = self.vllm
        qb = vllm.encode_queries([prompt], [image], [""])
        L = qb.embeds.shape[1]
        logits, cache = vllm.prefill(qb.embeds, qb.kv_valid,
                                     max_len=L + max_new_tokens)
        nxt = int(np.argmax(np.asarray(logits)[0, self._last_text_pos(qb)]))
        stop = (vllm.tokenizer.pad_token_id,
                getattr(vllm.tokenizer, "eos_token_id", -1))
        for _ in range(max_new_tokens):
            if nxt in stop:
                return
            yield nxt
            logits, cache = vllm.decode_step(cache, np.asarray([nxt]))
            nxt = int(np.argmax(np.asarray(logits)[0]))

    def _generate_cached(self, prompt, image, max_new_tokens: int) -> str:
        return self.vllm.tokenizer.decode(
            list(self._cached_token_ids(prompt, image, max_new_tokens)))

    def generate_stream(self, prompt, image=None, max_new_tokens: int = 10):
        """Yield text deltas as tokens decode — the reference worker's
        streaming mode (model_worker.py:44 generate_stream). Falls back
        to one whole-text chunk for editor-intervened or non-cacheable
        paths."""
        vllm = self.vllm
        if (self.editor is None
                and vllm.cfg.decoder.arch in ("opt", "llama")):
            with self._lock:
                out_ids: list = []
                sent = ""
                for tok in self._cached_token_ids(prompt, image,
                                                  max_new_tokens):
                    out_ids.append(tok)
                    text = vllm.tokenizer.decode(out_ids)
                    if len(text) > len(sent):
                        yield text[len(sent):]
                        sent = text
            return
        yield self.generate(prompt, image, max_new_tokens)

    # ---------------- http ----------------

    def handle(self, path: str, body: dict) -> dict:
        if path == "/status":
            edited = 0
            if self.editor is not None and hasattr(self.editor, "state"):
                st = self.editor.state
                if isinstance(st, dict) and "count" in st:
                    edited = int(st["count"])
            return {"name": self.name, "model": self.vllm.cfg.name,
                    "edits": edited}
        if path == "/generate":
            text = self.generate(body["prompt"], body.get("image"),
                                 int(body.get("max_new_tokens", 10)))
            return {"text": text}
        if path == "/edit":
            if self.editor is None:
                return {"error": "no editor attached"}
            with self._lock:
                self.editor.edit_one_piece(body)
            return {"ok": True}
        if path == "/restore":
            if self.editor is not None:
                with self._lock:
                    self.editor.restore_to_original_model()
            return {"ok": True}
        return {"error": "unknown endpoint %s" % path}

    def serve(self, host: str = "127.0.0.1", port: int = 21002,
              background: bool = False):
        worker = self

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
                self._respond(worker.handle(self.path, {}))

            def do_POST(self):
                n = int(self.headers.get("Content-Length", 0))
                body = json.loads(self.rfile.read(n) or b"{}")
                if self.path == "/generate_stream":
                    # chunked text deltas (model_worker.py streaming role)
                    self.send_response(200)
                    self.send_header("Content-Type",
                                     "text/plain; charset=utf-8")
                    self.send_header("Transfer-Encoding", "chunked")
                    self.end_headers()
                    for delta in worker.generate_stream(
                            body["prompt"], body.get("image"),
                            int(body.get("max_new_tokens", 10))):
                        data = delta.encode()
                        self.wfile.write(b"%x\r\n%s\r\n" % (len(data), data))
                        self.wfile.flush()
                    self.wfile.write(b"0\r\n\r\n")
                    return
                self._respond(worker.handle(self.path, body))

        self._httpd = ThreadingHTTPServer((host, port), Handler)
        if background:
            t = threading.Thread(target=self._httpd.serve_forever, daemon=True)
            t.start()
            return self._httpd
        self._httpd.serve_forever()

    def shutdown(self):
        if getattr(self, "_heartbeat_stop", None) is not None:
            self._heartbeat_stop.set()
        if self._httpd is not None:
            self._httpd.shutdown()
        if self._engine is not None:
            self._engine.shutdown()

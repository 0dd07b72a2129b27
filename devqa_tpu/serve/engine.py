"""Continuous-batching generation engine.

The reference serves one request at a time (its worker holds a model
lock around a full generate — model_worker.py); this engine is the
TPU-native production shape: a fixed number of decode SLOTS share one
KV cache and one compiled single-token decode program, so concurrent
requests decode together and per-token cost is amortized across the
batch. New requests prefill in a [1, L] program and their cache rows are
scattered into their slot; finished slots free immediately (continuous
batching, not static batching).

Shapes stay O(1): one prefill program per prompt-length bucket, one
decode program for the [n_slots] batch.
"""
from __future__ import annotations

import queue
import threading
from dataclasses import dataclass, field
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..core import decoder as dec


@dataclass
class _Request:
    prompt: str
    image: Optional[str]
    max_new_tokens: int
    done: threading.Event = field(default_factory=threading.Event)
    text: str = ""


class BatchingEngine:
    def __init__(self, vllm, n_slots: int = 4, max_len: int = 160,
                 poll_s: float = 0.002):
        if vllm.cfg.decoder.arch not in ("opt", "llama"):
            raise NotImplementedError(
                "continuous batching needs the KV-cache decode path")
        self.vllm = vllm
        self.n_slots = n_slots
        self.max_len = max_len
        self.poll_s = poll_s
        dcfg = vllm.cfg.decoder
        dtype = vllm.params["decoder"]["embed_tokens"].dtype
        self._cache = dec.init_kv_cache(dcfg, n_slots, max_len, dtype)
        self._slots: list = [None] * n_slots
        self._out_ids: list = [[] for _ in range(n_slots)]
        self._budget = np.zeros(n_slots, np.int32)
        self._queue: "queue.Queue[_Request]" = queue.Queue()
        self._stop = threading.Event()
        self._thread: Optional[threading.Thread] = None
        self._decode = jax.jit(self._decode_fn)
        self._scatter = jax.jit(self._scatter_fn, static_argnums=())

    # ---------------- device programs ----------------

    def _decode_fn(self, params, cache, tokens, active):
        """One batched decode step; inactive rows keep their cache."""
        temb = params["decoder"]["embed_tokens"][tokens]
        logits, new_cache = dec.decoder_decode_step(
            params["decoder"], self.vllm.cfg.decoder, cache, temb)
        keep = active[:, None].astype(jnp.int32)
        cache = {
            "k": jnp.where(active[None, :, None, None, None],
                           new_cache["k"], cache["k"]),
            "v": jnp.where(active[None, :, None, None, None],
                           new_cache["v"], cache["v"]),
            "valid": new_cache["valid"] * keep + cache["valid"] * (1 - keep),
        }
        return jnp.argmax(logits, -1), cache

    def _scatter_fn(self, cache, row_cache, slot):
        """Install a prefilled [*, 1, ...] row cache into slot ``slot``."""
        L = row_cache["valid"].shape[1]
        k = jax.lax.dynamic_update_slice(
            cache["k"],
            jnp.pad(row_cache["k"].astype(cache["k"].dtype),
                    ((0, 0), (0, 0), (0, 0), (0, self.max_len - L), (0, 0))),
            (0, slot, 0, 0, 0))
        v = jax.lax.dynamic_update_slice(
            cache["v"],
            jnp.pad(row_cache["v"].astype(cache["v"].dtype),
                    ((0, 0), (0, 0), (0, 0), (0, self.max_len - L), (0, 0))),
            (0, slot, 0, 0, 0))
        valid = jax.lax.dynamic_update_slice(
            cache["valid"],
            jnp.pad(row_cache["valid"], ((0, 0), (0, self.max_len - L))),
            (slot, 0))
        return {"k": k, "v": v, "valid": valid}

    # ---------------- host loop ----------------

    def submit(self, prompt: str, image: Optional[str] = None,
               max_new_tokens: int = 10) -> _Request:
        req = _Request(prompt, image, max_new_tokens)
        self._queue.put(req)
        return req

    def generate(self, prompt: str, image: Optional[str] = None,
                 max_new_tokens: int = 10, timeout: float = 600.0) -> str:
        req = self.submit(prompt, image, max_new_tokens)
        if not req.done.wait(timeout):
            raise TimeoutError("generation timed out")
        return req.text

    def _admit(self, tokens):
        vllm = self.vllm
        while True:
            try:
                free = self._slots.index(None)
            except ValueError:
                return tokens
            try:
                req = self._queue.get_nowait()
            except queue.Empty:
                return tokens
            qb = vllm.encode_queries([req.prompt], [req.image], [""])
            L = qb.embeds.shape[1]
            if L > self.max_len - req.max_new_tokens:
                req.text = ""
                req.done.set()
                continue
            logits, row_cache = vllm.prefill(qb.embeds, qb.kv_valid,
                                             max_len=L)
            V, p = vllm.cfg.n_img_tokens, vllm.cfg.img_slot_pos
            li = int(qb.prompt_lens[0]) - 1
            pos = li + V if li >= p else li
            first = int(np.argmax(np.asarray(logits)[0, pos]))
            self._cache = self._scatter(self._cache, row_cache,
                                        jnp.int32(free))
            self._slots[free] = req
            self._out_ids[free] = []
            self._budget[free] = req.max_new_tokens
            tokens[free] = first
        return tokens

    def _finish(self, slot):
        req = self._slots[slot]
        req.text = self.vllm.tokenizer.decode(self._out_ids[slot])
        req.done.set()
        self._slots[slot] = None

    def _loop(self):
        tok = self.vllm.tokenizer
        stop_ids = (tok.pad_token_id, getattr(tok, "eos_token_id", -1))
        tokens = np.zeros(self.n_slots, np.int64)
        while not self._stop.is_set():
            tokens = self._admit(tokens)
            active_rows = [i for i, r in enumerate(self._slots)
                           if r is not None]
            if not active_rows:
                # idle: block briefly for work
                try:
                    req = self._queue.get(timeout=self.poll_s)
                    self._queue.put(req)
                except queue.Empty:
                    continue
                continue
            # commit current next-tokens, retire finished slots
            for i in active_rows:
                t = int(tokens[i])
                if t in stop_ids or self._budget[i] <= 0:
                    self._finish(i)
                else:
                    self._out_ids[i].append(t)
                    self._budget[i] -= 1
            active = np.array([r is not None for r in self._slots], bool)
            if not active.any():
                continue
            new_tokens, self._cache = self._decode(
                self.vllm.params, self._cache, jnp.asarray(tokens),
                jnp.asarray(active))
            nt = np.asarray(new_tokens)
            for i in range(self.n_slots):
                if active[i]:
                    tokens[i] = nt[i]

    def start(self):
        self._thread = threading.Thread(target=self._loop, daemon=True)
        self._thread.start()
        return self

    def shutdown(self):
        self._stop.set()
        if self._thread is not None:
            self._thread.join(timeout=10)

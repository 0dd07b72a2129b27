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
import time
from collections import OrderedDict
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
    # set when admission failed (e.g. unreadable image): done fires with
    # text == "" and this carries the cause
    error: Optional[str] = None


class BatchingEngine:
    def __init__(self, vllm, n_slots: int = 4, max_len: int = 160,
                 poll_s: float = 0.002, steps_per_dispatch: int = 1,
                 prefix_cache_images: Optional[int] = None,
                 prefix_wave_steering: bool = False):
        if vllm.cfg.decoder.arch not in ("opt", "llama"):
            raise NotImplementedError(
                "continuous batching needs the KV-cache decode path")
        self.vllm = vllm
        self.n_slots = n_slots
        self.max_len = max_len
        self.poll_s = poll_s
        # K decode steps per device dispatch (lax.scan): on remote-
        # dispatch runtimes (~20ms/call over the tunnel) this amortizes
        # dispatch latency K-fold. Token streams are identical to K=1 —
        # tokens a row generates past its EOS/budget inside a scan are
        # discarded on the host, and a retired slot's cache is fully
        # overwritten at the next admit. Tradeoff: admission latency for
        # queued requests grows by up to K-1 tokens.
        self.steps_per_dispatch = max(1, steps_per_dispatch)
        dcfg = vllm.cfg.decoder
        dtype = vllm.params["decoder"]["embed_tokens"].dtype
        self._cache = dec.init_kv_cache(dcfg, n_slots, max_len, dtype)
        # Tensor-parallel serving: with a tp mesh on the wrapper, the
        # decoder's k/v projections are column-parallel (head features
        # sharded over tp — parallel/sharding.py), so the KV cache
        # shards its HEADS axis the same way; decode/prefill/scatter
        # then compile as SPMD programs with XLA-inserted collectives
        # and per-device cache memory of 1/tp. Shardings ride on the
        # arrays, so the engine's worker threads need no mesh context.
        mesh = getattr(vllm, "mesh", None)
        if mesh is not None and "tp" in mesh.axis_names \
                and dcfg.n_heads % mesh.shape["tp"] == 0:
            from jax.sharding import NamedSharding, PartitionSpec as P

            kv_s = NamedSharding(mesh, P(None, None, "tp", None, None))
            rep = NamedSharding(mesh, P())
            self._cache = {
                "k": jax.device_put(self._cache["k"], kv_s),
                "v": jax.device_put(self._cache["v"], kv_s),
                "valid": jax.device_put(self._cache["valid"], rep),
            }
        # Vision-prefix KV cache: the first P = img_slot_pos+n_img_tokens
        # positions of the slotted layout depend only on the image (plus
        # the constant pre-slot token, e.g. LLaVA's BOS), so their K/V
        # are computed once per image and reused across prompts via
        # decoder_prefill_continue — at LLaVA's 576 vision tokens that
        # skips ~90% of a repeat-image prompt's prefill compute. LRU of
        # device arrays keyed by image path; 0 disables. (The reference
        # worker recomputes the full prefix for every request.)
        self._prefix_len = vllm.cfg.img_slot_pos + vllm.cfg.n_img_tokens
        if prefix_cache_images is None:
            # Auto-gate on prefix size, like the flash-attention
            # dispatch: the continue path trades extra per-wave
            # dispatches (pre-slot id fetch, LRU row stacks, a SECOND
            # prefill program per width to compile) for skipped prefix
            # compute. Measured on v5e through the remote tunnel at
            # BLIP-2 scale (32 vision tokens): a LOSS — 272 vs ~300
            # tok/s warm, plus ~45s of continue-path compiles landing
            # inside the serving path on first use. At LLaVA scale the
            # cached prefix is 576 of ~600 prefill tokens (~90% of the
            # FLOPs), which is where reuse pays for its dispatches.
            # 256 is an INTERPOLATION between those two measured points
            # (32 = loss, 576 = win), not itself a measured crossover;
            # qwen-vl's 256 image tokens land exactly on it — re-measure
            # (bench.py llava serve A/B pattern) before serving a
            # ~256-token-prefix model hot.
            prefix_cache_images = 16 if vllm.cfg.n_img_tokens >= 256 else 0
        self._prefix_cap = (prefix_cache_images
                            if vllm.cfg.n_img_tokens > 0 else 0)
        # Wave steering (opt-in): split mixed hit/miss waves and defer
        # in-wave duplicate images so repeats ride the continue path.
        # Splitting trades EXTRA admission dispatches for prefill compute
        # — a win only when the prefix is large relative to the dispatch
        # floor (LLaVA's 576 vision tokens, local runtimes), a 2x serve
        # throughput LOSS on remote-tunnel runtimes at BLIP-2 scale
        # (measured: 14 waves x ~1.1s dispatch vs 4). Off = waves are
        # never split; the continue path still serves naturally all-hit
        # waves (steady repeat-image streams, e.g. post-warm MME).
        self._steering = prefix_wave_steering
        # Prefix cache as ONE device slot buffer + a path→slot LRU map
        # (r5 — same design as the wrapper's vision-token cache): k/v
        # [layers, cap+1, H, P, hd] with the LAST row always zero (the
        # text-only "no prefix" row), lazily allocated from the first
        # stored wave's shapes and grown by doubling up to _prefix_cap.
        # Per-wave assembly is an IN-PROGRAM gather
        # (wrapper.prefill_continue_idx) instead of 3 eager jnp.stacks
        # of LRU entries (~300MB of HBM copies + 3 tunnel dispatches per
        # 4-row wave at llava scale).
        self._prefix_lru: "OrderedDict[str, int]" = OrderedDict()
        self._prefix_buf = None
        self._prefix_free: list = []
        self._scatter_prefix_kv = jax.jit(
            lambda buf, idx, rows: buf.at[:, idx].set(rows),
            donate_argnums=0)
        self._scatter_prefix_valid = jax.jit(
            lambda buf, idx, rows: buf.at[idx].set(rows),
            donate_argnums=0)
        self._pre_slot_ids = None  # remembered ids of text[:img_slot_pos]
        self.prefix_hits = 0
        self.prefix_misses = 0
        self._slots: list = [None] * n_slots
        self._out_ids: list = [[] for _ in range(n_slots)]
        self._budget = np.zeros(n_slots, np.int32)
        self._queue: "queue.Queue[_Request]" = queue.Queue()
        # prefill-worker → decode-loop hand-off: bounded so at most a few
        # waves' KV rows sit in HBM awaiting install
        self._ready: "queue.Queue" = queue.Queue(maxsize=2)
        self._pending = None  # partially-installed ready wave
        self.tokens_generated = 0  # ops metric: total tokens across reqs
        # ops counters for perf triage: where serving wall-clock goes
        self.decode_dispatches = 0
        self.decode_s = 0.0
        self.admit_waves = 0
        self.admit_s = 0.0
        self.admit_encode_s = 0.0   # encode_queries (vision + embeds)
        self.admit_prefill_s = 0.0  # prefill dispatch + logits fetch
        self.admit_scatter_s = 0.0  # cache install
        self._stop = threading.Event()
        self._thread: Optional[threading.Thread] = None
        self._prefill_thread: Optional[threading.Thread] = None
        self._decode = jax.jit(self._decode_fn)
        self._scatter = jax.jit(self._scatter_fn, static_argnums=())
        # First-token pick stays ON DEVICE: fetching the full prefill
        # logits ([width, L, vocab] f32, ~150MB at 2.7b) through a
        # remote-device tunnel cost seconds per admission wave AND
        # queued ahead of decode round-trips; this fetches [width] ints.
        self._first_tok = jax.jit(
            lambda lg, pos: jnp.argmax(
                lg[jnp.arange(lg.shape[0]), pos], -1))

    # ---------------- device programs ----------------

    def _decode_fn(self, params, cache, tokens, active):
        """K batched decode steps in ONE program (lax.scan); inactive
        rows keep their cache. Returns [K, n_slots] greedy tokens."""

        def step(carry, _):
            toks, cache = carry
            temb = params["decoder"]["embed_tokens"][toks]
            logits, new_cache = dec.decoder_decode_step(
                params["decoder"], self.vllm.cfg.decoder, cache, temb)
            keep = active[:, None].astype(jnp.int32)
            cache = {
                "k": jnp.where(active[None, :, None, None, None],
                               new_cache["k"], cache["k"]),
                "v": jnp.where(active[None, :, None, None, None],
                               new_cache["v"], cache["v"]),
                "valid": new_cache["valid"] * keep
                + cache["valid"] * (1 - keep),
            }
            nt = jnp.argmax(logits, -1)
            return (nt, cache), nt

        (_, cache), outs = jax.lax.scan(
            step, (tokens, cache), None, length=self.steps_per_dispatch)
        return outs, cache

    def _scatter_fn(self, cache, row_cache, sel):
        """Install prefilled row caches into slots in ONE cache rewrite.

        ``row_cache`` is a [*, B, ...] prefill batch; ``sel`` is
        [n_slots] int32 mapping each slot to its source row (−1 = keep
        the slot's existing cache). A gather + one full-size ``where``
        per tensor installs any number of admitted rows at the cost of a
        single rewrite (the per-request dynamic_update_slice chain paid
        one full rewrite per admission)."""
        L = row_cache["valid"].shape[1]
        kk = jnp.pad(row_cache["k"].astype(cache["k"].dtype),
                     ((0, 0), (0, 0), (0, 0), (0, self.max_len - L), (0, 0)))
        vv = jnp.pad(row_cache["v"].astype(cache["v"].dtype),
                     ((0, 0), (0, 0), (0, 0), (0, self.max_len - L), (0, 0)))
        val = jnp.pad(row_cache["valid"], ((0, 0), (0, self.max_len - L)))
        selc = jnp.clip(sel, 0, None)
        m = sel >= 0
        return {
            "k": jnp.where(m[None, :, None, None, None],
                           kk[:, selc], cache["k"]),
            "v": jnp.where(m[None, :, None, None, None],
                           vv[:, selc], cache["v"]),
            "valid": jnp.where(m[:, None], val[selc], cache["valid"]),
        }

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
        if req.error:
            raise RuntimeError("generation failed: %s" % req.error)
        return req.text

    def _prefill_loop(self):
        """Prefill worker thread: encode + prefill queued requests into
        READY waves, overlapped with the decode loop. Admission's host
        latency (tokenize, image fetch, device round-trips, the logits
        sync) used to stall decoding with every slot idle — measured
        2.7s/wave warm through the remote tunnel vs 97ms per decode
        dispatch, i.e. admission WAS the serving cost. Now the decode
        loop only pays a cheap scatter-install per wave.

        Two fixed batch widths (1 for the steady-state dribble of single
        admissions, n_slots for bursts, padded by repeating row 0): one
        dispatch per wave either way, and the dribble path doesn't pay
        n_slots× prefill compute. O(1) compiled programs per
        sequence-length bucket (2)."""
        deferred: list = []
        while not self._stop.is_set():
            reqs, deferred = deferred, []
            if not reqs:
                try:
                    reqs = [self._queue.get(timeout=0.02)]
                except queue.Empty:
                    continue
                time.sleep(0.003)  # tiny batching window for burst arrivals
            while len(reqs) < self.n_slots:
                try:
                    reqs.append(self._queue.get_nowait())
                except queue.Empty:
                    break
            use_continue = False
            if self._prefix_cap:
                # A request is deferred AT MOST once (starvation guard:
                # under a continuous stream of new-image arrivals a hit
                # could otherwise be re-deferred forever); a re-collected
                # deferred request just rides whatever wave it is in.
                def defer_ok(r):
                    return not getattr(r, "_deferred", False)

                # Text-only rows (image None) "hit" with an all-invalid
                # zero prefix: positions restart at 0 and the masked
                # prefix keys are unattendable, so the continue path is
                # exact for them too (test_kv_cache.py pins the case) —
                # but ONLY for slot-at-0 layouts: with img_slot_pos > 0 a
                # text row's first real tokens occupy the layout's
                # pre-slot region, which the continue path replaces.
                text_ok = self.vllm.cfg.img_slot_pos == 0
                hit = [(r.image is None and text_ok)
                       or r.image in self._prefix_lru for r in reqs]
                img_hit = [r.image is not None and r.image in self._prefix_lru
                           for r in reqs]
                if any(img_hit) and not all(hit) and self._steering:
                    # Mixed wave: split it. Preferably run the misses now
                    # (they pay the full prefill and seed the cache) and
                    # defer the hits to the cheap continue path next
                    # wave; if the hits already used their one deferral,
                    # defer the misses and serve the hits now. If neither
                    # side may defer, the whole wave runs the full path.
                    hits_l = [r for r, h in zip(reqs, hit) if h]
                    misses_l = [r for r, h in zip(reqs, hit) if not h]
                    if all(defer_ok(r) for r in hits_l):
                        deferred = hits_l
                        reqs = misses_l
                    elif all(defer_ok(r) for r in misses_l):
                        deferred = misses_l
                        reqs = hits_l
                        use_continue = True
                    for r in deferred:
                        r._deferred = True
                elif all(hit) and any(img_hit):
                    use_continue = True
                if not use_continue and self._steering:
                    # Dedupe uncached images inside the wave: the first
                    # request prefills + stores the prefix; its
                    # wave-mates hit the cache next wave instead of
                    # re-prefilling the same image block (MME pairs two
                    # questions per image back-to-back).
                    seen, keep = set(), []
                    for r in reqs:
                        if r.image is not None and r.image in seen \
                                and defer_ok(r):
                            r._deferred = True
                            deferred.append(r)
                        else:
                            keep.append(r)
                            if r.image is not None:
                                seen.add(r.image)
                    reqs = keep
            t_admit = time.time()
            try:
                entries, row_cache = self._admit_wave(reqs, use_continue)
            except Exception as e:  # noqa: BLE001 — a bad request (e.g.
                # an unreadable image path) must fail ITS wave and keep
                # the admission thread alive; an unhandled raise would
                # kill the daemon silently and every later submit would
                # hang to its timeout with no cause attached.
                msg = "%s: %s" % (type(e).__name__, e)
                for r in reqs:
                    r.error = msg
                    r.done.set()
                continue
            self.admit_waves += 1
            self.admit_s += time.time() - t_admit
            if not entries:
                continue
            # Bounded hand-off (backpressure caps resident wave caches).
            while not self._stop.is_set():
                try:
                    self._ready.put((row_cache, entries), timeout=0.1)
                    break
                except queue.Full:
                    continue

    def _admit_wave(self, reqs, use_continue):
        """Encode + prefill one admission wave → (entries, row_cache).

        ``use_continue``: every request's image prefix is cached — run
        only the suffix through the decoder (decoder_prefill_continue).
        Falls back to the full path if the pre-slot token precondition
        breaks (a prompt whose text[:img_slot_pos] differs from the
        remembered constant, e.g. a BOS-less prompt — never in practice).
        """
        vllm = self.vllm
        V, p = vllm.cfg.n_img_tokens, vllm.cfg.img_slot_pos
        P = self._prefix_len
        t_admit = time.time()
        width = 1 if len(reqs) == 1 else self.n_slots
        pad = width - len(reqs)
        qb = vllm.encode_queries(
            [r.prompt for r in reqs] + [reqs[0].prompt] * pad,
            [r.image for r in reqs] + [reqs[0].image] * pad,
            [""] * width)
        t_enc = time.time()
        self.admit_encode_s += t_enc - t_admit
        L = qb.embeds.shape[1]
        pre_ids = None
        if self._prefix_cap and p:
            ids = np.asarray(qb.input_ids)
            pre_ids = [tuple(int(t) for t in ids[j, :p])
                       for j in range(width)]
            if use_continue and any(pi != self._pre_slot_ids
                                    for pi in pre_ids[: len(reqs)]):
                use_continue = False
        pos_off = 0
        if use_continue:
            z = self._prefix_buf_cap()  # last row: the all-zero prefix
            idx = []
            for r in reqs:
                if r.image is None:
                    idx.append(z)
                else:
                    self.prefix_hits += 1
                    idx.append(self._prefix_lru[r.image])
                    self._prefix_lru.move_to_end(r.image)
            idx += [idx[0]] * pad
            logits, row_cache = vllm.prefill_continue_idx(
                self._prefix_buf, idx, qb.embeds[:, P:], qb.kv_valid[:, P:],
                max_len=L)
            pos_off = P
        else:
            logits, row_cache = vllm.prefill(qb.embeds, qb.kv_valid,
                                             max_len=L)
            if self._prefix_cap:
                self.prefix_misses += sum(
                    1 for r in reqs if r.image is not None)
                self._store_prefixes(reqs, row_cache, pre_ids)
        li = np.asarray(qb.prompt_lens[:width], np.int32) - 1
        pos = np.where(li >= p, li + V, li) - pos_off
        first_toks = np.asarray(self._first_tok(logits, jnp.asarray(pos)))
        kv_rows = np.asarray(qb.kv_valid)
        self.admit_prefill_s += time.time() - t_enc
        if L > self.max_len:
            # Bucket padding can exceed the cache capacity even when
            # every row's REAL content fits — trim the padded tail
            # (content is right-padded, so positions >= real_len are
            # invalid filler). Rejection below stays per-row: one
            # over-long prompt must not take down its whole wave.
            row_cache = {
                "k": row_cache["k"][:, :, :, :self.max_len],
                "v": row_cache["v"][:, :, :, :self.max_len],
                "valid": row_cache["valid"][:, :self.max_len],
            }
        entries = []
        for j, req in enumerate(reqs):
            real_len = int(kv_rows[j].sum())
            if real_len > self.max_len - req.max_new_tokens:
                req.text = ""
                req.done.set()
                continue
            entries.append((req, j, int(first_toks[j])))
        return entries, row_cache

    def _prefix_buf_cap(self) -> int:
        return 0 if self._prefix_buf is None \
            else self._prefix_buf["valid"].shape[0] - 1

    def _grow_prefix_buf(self, n_needed, like_k):
        """Ensure the slot buffer holds ≥ n_needed rows (+ the zero
        row, which stays LAST — its index moves with capacity, so
        callers read it fresh via _prefix_buf_cap). Doubling growth up
        to _prefix_cap; shapes/dtype derive from a live row_cache slice
        (``like_k`` [layers, B, H, max_len, hd]) rather than config math
        so GQA/TP layouts inherit automatically."""
        cap = self._prefix_buf_cap()
        if cap >= n_needed:
            return
        new_cap = max(1, cap)
        while new_cap < n_needed:
            new_cap *= 2
        new_cap = min(new_cap, self._prefix_cap)
        P = self._prefix_len
        layers, _, H, _, hd = like_k.shape
        kv_shape = (layers, new_cap + 1, H, P, hd)
        if self._prefix_buf is None:
            self._prefix_buf = {
                "k": jnp.zeros(kv_shape, like_k.dtype),
                "v": jnp.zeros(kv_shape, like_k.dtype),
                "valid": jnp.zeros((new_cap + 1, P), jnp.int32),
            }
        else:
            pad = new_cap - cap
            self._prefix_buf = {
                "k": jnp.concatenate(
                    [self._prefix_buf["k"][:, :cap],
                     jnp.zeros((layers, pad + 1, H, P, hd), like_k.dtype)],
                    axis=1),
                "v": jnp.concatenate(
                    [self._prefix_buf["v"][:, :cap],
                     jnp.zeros((layers, pad + 1, H, P, hd), like_k.dtype)],
                    axis=1),
                "valid": jnp.concatenate(
                    [self._prefix_buf["valid"][:cap],
                     jnp.zeros((pad + 1, P), jnp.int32)], axis=0),
            }
        self._prefix_free.extend(range(cap, new_cap))

    def _store_prefixes(self, reqs, row_cache, pre_ids):
        """Scatter each new image's [*, :P] cache block into the slot
        buffer — ONE batched scatter per tensor per wave (device-array
        slices, never fetched to host)."""
        P = self._prefix_len
        if not P or row_cache["valid"].shape[1] < P:
            return
        js, slots = [], []
        for j, req in enumerate(reqs):
            if req.image is None or req.image in self._prefix_lru:
                continue
            if pre_ids is not None:
                if self._pre_slot_ids is None:
                    self._pre_slot_ids = pre_ids[j]
                if pre_ids[j] != self._pre_slot_ids:
                    continue  # uncacheable layout for this prompt
            if not self._prefix_free \
                    and self._prefix_buf_cap() < self._prefix_cap:
                self._grow_prefix_buf(len(self._prefix_lru) + 1,
                                      row_cache["k"])
            if not self._prefix_free:  # at capacity: evict oldest
                _, s = self._prefix_lru.popitem(last=False)
                self._prefix_free.append(s)
            s = self._prefix_free.pop()
            if s in slots:
                # The evicted entry was stored EARLIER IN THIS WAVE
                # (capacity below the wave's new-image count): drop its
                # pending write — it just left the LRU, and duplicate
                # indices in one scatter have an UNSPECIFIED winner,
                # which could leave this slot holding the evicted
                # image's k/v under the new image's key.
                drop = slots.index(s)
                del js[drop], slots[drop]
            self._prefix_lru[req.image] = s
            js.append(j)
            slots.append(s)
        if not js:
            return
        idx = jnp.asarray(np.asarray(slots, np.int32))
        self._prefix_buf = {
            "k": self._scatter_prefix_kv(
                self._prefix_buf["k"], idx, row_cache["k"][:, js, :, :P]),
            "v": self._scatter_prefix_kv(
                self._prefix_buf["v"], idx, row_cache["v"][:, js, :, :P]),
            "valid": self._scatter_prefix_valid(
                self._prefix_buf["valid"], idx,
                row_cache["valid"][js, :P].astype(jnp.int32)),
        }

    def _admit(self, tokens):
        """Install READY prefilled waves into free slots — one
        multi-row scatter per wave; the heavy work already happened in
        the prefill worker, overlapped with decoding."""
        while True:
            free = [i for i, r in enumerate(self._slots) if r is None]
            if not free:
                return tokens
            if self._pending is None:
                try:
                    self._pending = self._ready.get_nowait()
                except queue.Empty:
                    return tokens
            row_cache, entries = self._pending
            sel = np.full(self.n_slots, -1, np.int32)
            taken = 0
            while entries and free:
                req, j, first_tok = entries.pop(0)
                slot = free.pop(0)
                sel[slot] = j
                self._slots[slot] = req
                self._out_ids[slot] = []
                self._budget[slot] = req.max_new_tokens
                tokens[slot] = first_tok
                taken += 1
            if taken:
                t_sc = time.time()
                self._cache = self._scatter(self._cache, row_cache,
                                            jnp.asarray(sel))
                self.admit_scatter_s += time.time() - t_sc
            if entries:  # slots ran out: keep the wave's tail pending
                return tokens
            self._pending = None

    def _finish(self, slot):
        req = self._slots[slot]
        req.text = self.vllm.tokenizer.decode(self._out_ids[slot])
        self.tokens_generated += len(self._out_ids[slot])
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
                # idle: the prefill worker owns the request queue; just
                # wait briefly for it to hand over a ready wave
                time.sleep(self.poll_s)
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
            t_dec = time.time()
            outs, self._cache = self._decode(
                self.vllm.params, self._cache, jnp.asarray(tokens),
                jnp.asarray(active))
            outs = np.asarray(outs)  # [K, n_slots]
            self.decode_dispatches += 1
            self.decode_s += time.time() - t_dec
            # Commit the first K-1 tokens inline (stop/budget checked per
            # token; rows finishing mid-scan stop committing — their
            # later scan tokens are overrun and discarded). The last
            # token stays pending for the loop-top commit, so K=1
            # reproduces the original single-step behavior exactly.
            for k in range(outs.shape[0] - 1):
                for i in range(self.n_slots):
                    if active[i] and self._slots[i] is not None:
                        t = int(outs[k, i])
                        if t in stop_ids or self._budget[i] <= 0:
                            self._finish(i)
                        else:
                            self._out_ids[i].append(t)
                            self._budget[i] -= 1
            for i in range(self.n_slots):
                if active[i] and self._slots[i] is not None:
                    tokens[i] = outs[-1, i]

    def start(self):
        self._thread = threading.Thread(target=self._loop, daemon=True)
        self._thread.start()
        self._prefill_thread = threading.Thread(target=self._prefill_loop,
                                                daemon=True)
        self._prefill_thread.start()
        return self

    def shutdown(self):
        self._stop.set()
        if self._thread is not None:
            self._thread.join(timeout=10)
        if self._prefill_thread is not None:
            self._prefill_thread.join(timeout=10)

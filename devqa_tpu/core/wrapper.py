"""JaxVLLM — the stateful host-side wrapper around a VLLM parameter pytree.

The functional analog of the reference's ``BaseVLLMForEdit``
(``editor/vllms_for_edit/base.py:22-234``): it owns params + tokenizer +
image pipeline and exposes the operations editors and the evaluation
harness consume:

- :meth:`encode_queries` — (prompts, image paths, targets) → a
  :class:`QueryBatch` of device arrays in the uniform slotted layout;
  the batched analog of ``prompts_imgs_target_to_xym`` (base.py:75-109).
- :meth:`logits` / :meth:`hidden_at` / :meth:`resume_from` — jitted
  forwards, mid-layer capture and resume (base.py:138-185) — jit caches
  are keyed per static layer index.
- an LRU **vision cache**: encoded vision tokens per image path. The
  reference recomputes ViT+Q-Former per probe (SURVEY.md §3.1 hot loop);
  here each unique image is encoded once per appearance window.
"""
from __future__ import annotations

import dataclasses
import os
from collections import OrderedDict
from typing import Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..data.images import ImageProvider
from ..data.xym import SampleTokens, batch_samples, tokenize_sample
from .preprocess import preprocess_images
from .tokenizer import Tokenizer
from .vllm import (VLLMConfig, assemble_embeds, encode_image,
                   vllm_hidden_at, vllm_logits, vllm_resume_from)
from . import decoder as dec


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class QueryBatch:
    """Device-ready batch of (prompt, image, target) queries in the full
    slotted layout [text[:p] | V vision slots | text[p:]].

    Registered as a pytree so whole batches pass through jit boundaries.
    """

    embeds: jnp.ndarray       # [B, Lf, d]
    kv_valid: jnp.ndarray     # [B, Lf]
    label_ids: jnp.ndarray    # [B, Lf] full-layout labels
    label_masks: jnp.ndarray  # [B, Lf] supervised-span mask
    prompt_lens: np.ndarray   # [B] text prompt token counts (incl BOS)
    has_image: np.ndarray     # [B]
    input_ids: np.ndarray     # [B, Lt] text tokens (host copy)


@dataclasses.dataclass
class PackedQuery:
    """A query batch in PRE-assembly form: one int array + the vision
    slot buffer. Purpose: ONE fused device program per probe chunk.

    ``encode_queries`` costs ~8 device dispatches per chunk (vision row
    stack, five transfers, assemble, forward); through a remote-dispatch
    tunnel each program pays a fixed ~5-10ms floor, ~15% of a 120x96
    chunk's forward (measured, scripts/profile_headline.py). A packed
    query ships 2 transfers and lets the consumer's jit do vision-row
    gather + assemble + forward + metrics as one program. The gather
    moved IN-program (r5): the eager ``jnp.take`` was one more tunnel
    dispatch plus a [B, V, d] HBM round-trip per chunk, and the buffer
    capacity it was avoiding in the jit signature is pre-grown once per
    run by ``ensure_image_cache_capacity`` (harness/bench both call it),
    so the capacity-keyed recompile happens at warm-up, not mid-run.

    ``img_buf`` is the LIVE slot buffer at dispatch time — consumers
    MUST pass it to their fused program before the wrapper encodes any
    further images: a later cache-miss scatter DONATES this buffer
    (wrapper._scatter_rows_jit), deleting its device memory, and a
    deferred dispatch then raises "Array has been deleted" rather than
    reading stale rows.
    """

    ints: jnp.ndarray         # [4, B, Lt] i32: ids, attn, label_ids, label_masks
    rowmeta: jnp.ndarray      # [3, B] i32: has_image, query_end, img_slot
    img_buf: jnp.ndarray      # [cap+1, V, d] vision slot buffer (device)
    prompt_lens: np.ndarray   # [B] host
    has_image: np.ndarray     # [B] host
    label_masks_full: np.ndarray  # [B, Lt+V] host copy (result assembly)


def assemble_packed(params, cfg, ints, rowmeta, img_buf):
    """Traced assemble for a PackedQuery → (embeds, kv_valid,
    label_ids, label_masks), all full-layout. Call INSIDE a jit (the
    whole point); semantics identical to ``encode_queries``'s
    assemble + numpy label placement (text label j → full j+V for
    j ≥ img_slot_pos; earlier positions are never supervised)."""
    ids, attn = ints[0], ints[1]
    img_rows = jnp.take(img_buf, rowmeta[2], axis=0)
    embeds, kv = assemble_embeds(params, cfg, ids, attn, img_rows,
                                 rowmeta[0])
    V, p = cfg.n_img_tokens, cfg.img_slot_pos
    B = ids.shape[0]
    zeros = jnp.zeros((B, p + V), jnp.int32)
    labels = jnp.concatenate([zeros, ints[2][:, p:]], axis=1)
    masks = jnp.concatenate([zeros, ints[3][:, p:]], axis=1)
    return embeds, kv, labels, masks


class JaxVLLM:
    def __init__(
        self,
        cfg: VLLMConfig,
        params,
        tokenizer: Tokenizer,
        image_provider: ImageProvider,
        img_cache_size: int = 256,
        bucket_multiple: int = 32,
        min_len: int = 16,
        img_batch_pad: int = 4,
        mesh=None,
    ):
        """``mesh``: a (dp, tp) jax.sharding.Mesh for distributed
        evaluation — query batches shard their rows over ``dp`` (pass
        params already sharded via parallel.sharding.shard_params for
        tensor parallelism); GSPMD inserts the collectives. Row counts
        that don't divide dp stay replicated (pad chunks to a multiple —
        the fused harness's pad_rows does)."""
        self.cfg = cfg
        self.params = params
        self.tokenizer = tokenizer
        self.image_provider = image_provider
        self.bucket_multiple = bucket_multiple
        self.min_len = min_len
        self.mesh = mesh
        # Pad vision-encode batches up to a multiple of this so the number
        # of distinct compiled encode programs stays O(1) (remote-compile
        # TPU runtimes pay tens of seconds per new shape).
        self.img_batch_pad = max(1, img_batch_pad)
        # Vision-token LRU as ONE device buffer [cap+1, V, d] (last row
        # always zero = the no-image row) + a path→slot map. A dict of
        # per-image device arrays needs a B-operand jnp.stack per query
        # batch — B separate buffers through one eager concatenate — and
        # keeps the rows un-gatherable inside fused programs; a slot
        # buffer turns every lookup into one jnp.take (or an in-program
        # gather via packed queries) and every encode batch into one
        # donated scatter.
        self._img_cache: OrderedDict[str, int] = OrderedDict()  # path→slot
        self._img_buf = None
        self._img_free: list = []
        self._img_cache_size = img_cache_size
        # Compute accounting for MFU reporting (utils/flops.py):
        # images_encoded counts device-encoded rows (padding included —
        # that compute is performed), decoder_tokens counts padded tokens
        # through vllm.logits. Editors with their own jitted query paths
        # are counted at the harness chokepoint instead.
        # images_encoded counts DEVICE rows (incl. fixed-batch padding —
        # what the chip computed); images_unique counts distinct cache
        # misses (useful work). MFU accounting uses the useful count so
        # batch padding can never inflate the reported utilization.
        self.counters = {"images_encoded": 0, "images_unique": 0,
                         "decoder_tokens": 0}

        # All jitted entry points are INSTANCE-held closures over the
        # (small, frozen) cfg — never @jax.jit on methods with a static
        # self: the class-level jit cache would hold self (and its
        # multi-GB params) strongly long after the wrapper is deleted.
        # Instance-held PjitFunctions release their executables with the
        # instance.
        self._encode_images_jit = jax.jit(
            lambda params, u8: encode_image(
                params, cfg, preprocess_images(u8, cfg.vit.image_size)))
        self._logits_jit = jax.jit(
            lambda params, embeds, kv: vllm_logits(params, cfg, embeds, kv))
        # Fused forward+metrics: argmax/accuracy computed INSIDE the
        # forward program, so the [B, L, vocab] f32 logits tensor never
        # round-trips HBM between two dispatches (profiled on v5e: lm
        # head 25ms + separate metrics program 9ms per 120-row chunk;
        # the fused reduction lets XLA keep logit tiles on-chip).
        from .losses import token_accuracy as _tok_acc

        self._logits_metrics_jit = jax.jit(
            lambda params, embeds, kv, ids, masks: _tok_acc(
                vllm_logits(params, cfg, embeds, kv), ids, masks))
        self._assemble_jit = jax.jit(
            lambda params, ids, mask, img, has: assemble_embeds(
                params, cfg, ids, mask, img, has))
        self._hidden_at_jit = jax.jit(
            lambda params, embeds, kv, layer: vllm_hidden_at(
                params, cfg, embeds, kv, layer), static_argnums=3)
        self._resume_jit = jax.jit(
            lambda params, hidden, kv, layer: vllm_resume_from(
                params, cfg, hidden, kv, layer), static_argnums=3)
        self._prefill_jit = jax.jit(
            lambda params, embeds, kv, max_len: dec.decoder_prefill(
                params["decoder"], cfg.decoder, embeds, kv, max_len),
            static_argnums=3)
        self._prefill_continue_jit = jax.jit(
            lambda params, prefix, embeds, kv, max_len:
                dec.decoder_prefill_continue(
                    params["decoder"], cfg.decoder, prefix, embeds, kv,
                    max_len),
            static_argnums=4)
        # Slot-buffer variant: the serve engine's prefix cache is ONE
        # device buffer (k/v [layers, cap+1, H, P, hd], valid
        # [cap+1, P], last row zeros) and the per-request rows are
        # gathered IN-PROGRAM — the per-wave eager jnp.stack of LRU
        # entries was 3 extra tunnel dispatches and a ~300MB HBM copy
        # per 4-row wave at llava scale (same economics as the vision
        # slot buffer / packed-query gather).
        self._prefill_continue_idx_jit = jax.jit(
            lambda params, bufk, bufv, bufvalid, idx, embeds, kv, max_len:
                dec.decoder_prefill_continue(
                    params["decoder"], cfg.decoder,
                    {"k": jnp.take(bufk, idx, axis=1),
                     "v": jnp.take(bufv, idx, axis=1),
                     "valid": jnp.take(bufvalid, idx, axis=0)},
                    embeds, kv, max_len),
            static_argnums=7)
        self._decode_step_jit = jax.jit(
            lambda params, cache, token_ids: dec.decoder_decode_step(
                params["decoder"], cfg.decoder, cache,
                params["decoder"]["embed_tokens"][token_ids]))
        # Donated row scatter for the vision buffer: without donation
        # every encode batch copies the WHOLE buffer (at the 1000-edit
        # protocol's ~6k-row capacity that is ~1GB of HBM traffic per
        # 8-image batch). Donation is safe: consumers only ever hold
        # GATHERED COPIES of rows (jnp.take), never the buffer itself,
        # and the single device stream executes any pending readers
        # before the scatter.
        self._scatter_rows_jit = jax.jit(
            lambda buf, idx, rows: buf.at[idx].set(rows.astype(buf.dtype)),
            donate_argnums=0)
        # Fused packed-query program: gather vision rows + assemble +
        # forward + masked-argmax metrics in ONE device program (see
        # encode_queries_packed — on remote-dispatch runtimes the
        # per-program floor makes the multi-dispatch path ~15% slower
        # per probe chunk).
        def _packed_metrics(params, ints, rowmeta, img_buf):
            embeds, kv, labels, masks = assemble_packed(
                params, cfg, ints, rowmeta, img_buf)
            return _tok_acc(vllm_logits(params, cfg, embeds, kv),
                            labels, masks)

        self._packed_metrics_jit = jax.jit(_packed_metrics)
        # Gathered-head variant: project ONLY supervised positions onto
        # the vocabulary (losses.gathered_token_accuracy — the metric
        # never reads the rest; the full head is 26.5ms of a 433ms
        # headline chunk and 2/3 of it is unsupervised positions).
        # Engaged per call by packed_logits_metrics when every row fits
        # the static gather width; DEVQA_GATHER_HEAD_P=0 disables.
        self._gather_positions = int(
            os.environ.get("DEVQA_GATHER_HEAD_P", "32"))

        from .losses import gathered_token_accuracy as _gtok_acc
        from .vllm import vllm_hidden as _vllm_hidden

        def _packed_metrics_gathered(params, ints, rowmeta, img_buf, n_pos):
            # n_pos is a STATIC argument, not a closed-over read of
            # self._gather_positions: the harness raises the width
            # mid-process (run-level sizing), and a closure read at trace
            # time would let same-shape calls reuse a stale narrower
            # executable, silently dropping supervised positions.
            embeds, kv, labels, masks = assemble_packed(
                params, cfg, ints, rowmeta, img_buf)
            h = _vllm_hidden(params, cfg, embeds, kv)
            return _gtok_acc(
                h, labels, masks, n_pos,
                pred_fn=lambda hg: dec.decoder_pred_ids(
                    params["decoder"], cfg.decoder, hg))

        self._packed_metrics_gathered_jit = jax.jit(
            _packed_metrics_gathered, static_argnums=4)

    # ---------------- vision ----------------

    def ensure_image_cache_capacity(self, n_images: int,
                                    max_bytes: int = 2 << 30) -> int:
        """Grow the vision-token LRU to hold ``n_images`` rows, bounded by
        ``max_bytes`` of device memory (a row is V x d bf16, ~160KB for
        BLIP-2). Training epochs and sequential-edit splits revisit the
        same images; an undersized cache thrashes and every batch pays a
        ViT encode. Returns the resulting capacity."""
        itemsize = jnp.dtype(
            self.params["decoder"]["embed_tokens"].dtype).itemsize
        row = self.cfg.n_img_tokens * self.cfg.decoder.d_model * itemsize
        if row > 0:  # text-only configs (V=0) cache nothing
            self._img_cache_size = max(self._img_cache_size,
                                       min(int(n_images), max_bytes // row))
            # Pre-grow the slot buffer to the final capacity NOW: lazy
            # doubling inside an eval/train loop recompiles the donated
            # scatter program once per growth step (each buffer capacity
            # is a new shape) — measured as the only fresh compiles in
            # the 1000-edit bench phase. One up-front grow = one shape.
            self._grow_buf(self._img_cache_size)
        return self._img_cache_size

    # -- slot-buffer plumbing (see _img_cache comment in __init__) --

    def _buf_capacity(self) -> int:
        return 0 if self._img_buf is None else self._img_buf.shape[0] - 1

    def _grow_buf(self, n_needed: int) -> None:
        """Ensure the buffer holds ≥ n_needed rows (+ the zero row).
        Doubling growth keeps realloc programs O(log n); new rows are
        zeros, and the zero row stays LAST so existing slot indices and
        the no-image index both survive a grow... except the no-image
        index moves with capacity — callers always read it fresh via
        ``_zero_slot``."""
        cap = self._buf_capacity()
        if cap >= n_needed:
            return
        V, d = self.cfg.n_img_tokens, self.cfg.decoder.d_model
        dtype = jnp.dtype(self.params["decoder"]["embed_tokens"].dtype)
        new_cap = max(n_needed, 2 * cap, 32)
        if self._img_buf is None:
            self._img_buf = jnp.zeros((new_cap + 1, V, d), dtype)
        else:
            self._img_buf = jnp.concatenate(
                [self._img_buf[:cap],
                 jnp.zeros((new_cap + 1 - cap, V, d), dtype)], axis=0)
        self._img_free.extend(range(cap, new_cap))

    def _zero_slot(self) -> int:
        return self._buf_capacity()  # last row, always zeros

    def _alloc_slot(self) -> int:
        if not self._img_free:
            self._grow_buf(self._buf_capacity() + 1)
        return self._img_free.pop()

    def _evict_oldest(self) -> None:
        _, slot = self._img_cache.popitem(last=False)
        self._img_free.append(slot)

    def _encode_uncached(self, todo: List[str]) -> None:
        """Encode ``todo`` (unique, uncached paths) into the LRU.

        Encodes in FIXED-size device batches of exactly img_batch_pad
        rows (last batch padded by repetition). Padding the whole todo
        list to a *multiple* instead makes the batch shape a function
        of how many images missed the cache — on a remote-compile
        runtime every new unique-count costs a 30-90s XLA compile.
        Fixed-size chunks keep the compiled encode program count at 1.
        Each batch lands in the slot buffer via one donated scatter.
        """
        bp = self.img_batch_pad
        self.counters["images_encoded"] += bp * ((len(todo) + bp - 1) // bp)
        self.counters["images_unique"] += len(todo)
        self._grow_buf(len(self._img_cache) + len(todo))
        for lo in range(0, len(todo), bp):
            chunk = todo[lo:lo + bp]
            imgs = [self.image_provider(p) for p in chunk]
            imgs.extend([imgs[0]] * (bp - len(chunk)))
            u8 = jnp.asarray(np.stack(imgs))
            toks = self._encode_images_jit(self.params, u8)
            slots = [self._alloc_slot() for _ in chunk]
            # Pad the scatter to the fixed encode width (same O(1)-shape
            # rule as the encode itself). Padding rows scatter OUT OF
            # BOUNDS on purpose — JAX drops OOB scatter updates — since
            # a duplicate in-bounds index has UNSPECIFIED winner order
            # and the pad rows are re-encodes of chunk[0], not copies
            # of the row they'd collide with.
            idx = np.full((bp,), self._img_buf.shape[0], np.int32)
            idx[:len(slots)] = slots
            self._img_buf = self._scatter_rows_jit(
                self._img_buf, jnp.asarray(idx), toks)
            for p, s in zip(chunk, slots):
                self._img_cache[p] = s
                self._img_cache.move_to_end(p)

    def warm_image_cache(self, paths: Sequence[Optional[str]]) -> int:
        """Pre-encode every unique uncached path in FULL fixed-size
        batches, so per-query-batch cache misses never arrive in small
        padded groups. The fused eval harness knows its entire probe grid
        upfront; warming across cases cuts vision-batch padding from the
        per-chunk miss pattern (~27% pad rows measured on the EVQA grid)
        to at most one partial final batch. The reference re-encodes
        ViT+Q-Former per probe (SURVEY.md §3.1 hot loop) and has no
        cross-case packing at all.

        No-op (returns 0) when the unique set exceeds the LRU capacity:
        warming would evict the earliest-needed entries first and every
        hit would become a miss again. Returns the number encoded.
        """
        uniq = [p for p in dict.fromkeys(paths) if p is not None]
        if not uniq or len(uniq) > self._img_cache_size:
            return 0
        for p in uniq:
            if p in self._img_cache:
                self._img_cache.move_to_end(p)
        todo = [p for p in uniq if p not in self._img_cache]
        if todo:
            self._encode_uncached(todo)
            while len(self._img_cache) > self._img_cache_size:
                self._evict_oldest()
        return len(todo)

    def _image_slots(self, paths: Sequence[Optional[str]]) -> Tuple[np.ndarray, np.ndarray]:
        """Paths (None = no image) → (slot indices [B], has_image [B]),
        encoding any uncached paths into the slot buffer first."""
        has = np.array([1 if p is not None else 0 for p in paths], np.int32)
        uniq = [p for p in dict.fromkeys(paths) if p is not None]
        # Refresh recency of already-cached paths FIRST: the eviction after
        # the encode loop must never pop a path this call is about to read
        # (it did — a stale-but-needed entry got LRU-evicted by a large
        # todo batch and the row gather below raised KeyError mid-epoch).
        for p in uniq:
            if p in self._img_cache:
                self._img_cache.move_to_end(p)
        todo = [p for p in uniq if p not in self._img_cache]
        if todo:
            self._encode_uncached(todo)
            # Never shrink below this call's working set (a single call
            # can reference more unique paths than the cache capacity).
            keep = max(self._img_cache_size, len(uniq))
            while len(self._img_cache) > keep:
                self._evict_oldest()
        if self._img_buf is None:
            self._grow_buf(1)  # all-None batch before any encode
        z = self._zero_slot()
        idx = np.array([self._img_cache[p] if p is not None else z
                        for p in paths], np.int32)
        return idx, has

    def encode_images(self, paths: Sequence[Optional[str]]) -> Tuple[jnp.ndarray, np.ndarray]:
        """Paths (None = no image) → (vision tokens [B, V, d], has_image [B]).

        Unique uncached paths are decoded + encoded in fixed-size device
        batches into the slot buffer; the batch is ONE gather from it
        (the old per-row dict needed a B-operand stack per call).
        """
        idx, has = self._image_slots(paths)
        return jnp.take(self._img_buf, jnp.asarray(idx), axis=0), has

    # ---------------- queries ----------------

    def _prompt_text(self, prompt: str, has_image: bool) -> str:
        """The auto-add-image-token rule (base.py:49-51): models with an
        image special token get '<tok>\\n' prepended when an image is
        present; we strip the token itself (the slot layout realizes it)
        and keep the '\\n'."""
        if self.cfg.img_special_token is None:
            return prompt
        ist = self.cfg.img_special_token
        if ist in prompt:
            prompt = prompt.replace(ist + "\n", "").replace(ist, "")
        if has_image:
            return "\n" + prompt
        return prompt

    def tokenize_queries(
        self,
        prompts: Sequence[str],
        image_paths: Sequence[Optional[str]],
        targets: Sequence[str],
    ) -> List[SampleTokens]:
        return [
            tokenize_sample(
                self.tokenizer,
                self._prompt_text(p, img is not None),
                t,
                image_id=img,
            )
            for p, img, t in zip(prompts, image_paths, targets)
        ]

    def encode_queries(
        self,
        prompts: Sequence[str],
        image_paths: Sequence[Optional[str]],
        targets: Sequence[str],
    ) -> QueryBatch:
        """The batched ``prompts_imgs_target_to_xym``: builds full-layout
        embeds + labels for B queries in one device batch."""
        samples = self.tokenize_queries(prompts, image_paths, targets)
        tb = batch_samples(samples, self.tokenizer.pad_token_id,
                           bucket_multiple=self.bucket_multiple,
                           min_len=self.min_len)
        img_tokens, has = self.encode_images(image_paths)
        embeds, kv = self._assemble_jit(
            self.params, jnp.asarray(tb.input_ids), jnp.asarray(tb.attn_mask),
            img_tokens, jnp.asarray(has))
        V, p = self.cfg.n_img_tokens, self.cfg.img_slot_pos
        B, Lt = tb.input_ids.shape
        full_labels = np.zeros((B, Lt + V), np.int32)
        full_masks = np.zeros((B, Lt + V), np.int32)
        # Supervised spans always start at text position prompt_len-1 ≥ p,
        # so the whole supervised region maps text j → full j+V.
        full_labels[:, p + V:] = tb.label_ids[:, p:]
        full_masks[:, p + V:] = tb.label_masks[:, p:]
        prompt_lens = np.array([s.prompt_len for s in samples], np.int32)
        qb = QueryBatch(
            embeds=embeds, kv_valid=kv,
            label_ids=jnp.asarray(full_labels),
            label_masks=jnp.asarray(full_masks),
            prompt_lens=prompt_lens, has_image=has, input_ids=tb.input_ids)
        return self._shard_query_batch(qb)

    def encode_queries_packed(
        self,
        prompts: Sequence[str],
        image_paths: Sequence[Optional[str]],
        targets: Sequence[str],
    ) -> PackedQuery:
        """``encode_queries`` in pre-assembly form: tokenize + encode any
        uncached images, then ship TWO int transfers; the consumer's jit
        does gather/assemble/forward/metrics as one program (see
        PackedQuery — the multi-dispatch path pays a per-program floor
        on remote runtimes). No mesh sharding: callers under a mesh use
        ``encode_queries``."""
        samples = self.tokenize_queries(prompts, image_paths, targets)
        tb = batch_samples(samples, self.tokenizer.pad_token_id,
                           bucket_multiple=self.bucket_multiple,
                           min_len=self.min_len)
        idx, has = self._image_slots(image_paths)
        prompt_lens = np.array([s.prompt_len for s in samples], np.int32)
        V, p = self.cfg.n_img_tokens, self.cfg.img_slot_pos
        B, Lt = tb.input_ids.shape
        ints = np.stack([tb.input_ids, tb.attn_mask,
                         tb.label_ids, tb.label_masks]).astype(np.int32)
        rowmeta = np.stack([has, prompt_lens + V, idx]).astype(np.int32)
        full_masks = np.zeros((B, Lt + V), np.int32)
        full_masks[:, p + V:] = tb.label_masks[:, p:]
        return PackedQuery(
            ints=jnp.asarray(ints), rowmeta=jnp.asarray(rowmeta),
            img_buf=self._img_buf, prompt_lens=prompt_lens,
            has_image=has, label_masks_full=full_masks)

    def packed_logits_metrics(self, pq: PackedQuery):
        """Fused assemble+forward+metrics → (acc [B], pred, valid) —
        metric-identical to ``logits_metrics(encode_queries(...))`` in
        ONE device program.

        When every row's supervised span fits the static gather width
        (checked here against the host label-mask copy), the LM head runs
        only at supervised positions and ``pred`` comes back in GATHERED
        layout with its validity mask; otherwise ``pred`` is full-layout
        and ``valid`` is None (consumers read ``pred[valid_or_masks ==
        1]`` either way — same tokens, same order)."""
        B, Lt = pq.ints.shape[1], pq.ints.shape[2]
        self.counters["decoder_tokens"] += int(
            B * (Lt + self.cfg.n_img_tokens))
        if self._gather_head_ok(pq):
            return self._packed_metrics_gathered_jit(
                self.params, pq.ints, pq.rowmeta, pq.img_buf,
                self._gather_positions)
        a, p = self._packed_metrics_jit(self.params, pq.ints, pq.rowmeta,
                                        pq.img_buf)
        return a, p, None

    def _gather_head_ok(self, pq: PackedQuery) -> bool:
        """Gathered-head eligibility: enabled, strictly narrower than the
        full layout, and no row overflows the static gather width."""
        P = self._gather_positions
        Lf = pq.label_masks_full.shape[1]
        return (P > 0 and P < Lf
                and int(pq.label_masks_full.sum(axis=1).max(initial=0)) <= P)

    def _shard_query_batch(self, qb: QueryBatch) -> QueryBatch:
        """Shard device leaves' rows over the mesh's data axes (no-op
        without a mesh or when B doesn't divide them). Multi-slice
        ("dcn", "dp", "tp") meshes shard rows over dcn x dp."""
        if self.mesh is None:
            return qb
        row_axes = ("dcn", "dp") if "dcn" in self.mesh.axis_names \
            else ("dp",)
        n_rows = 1
        for a in row_axes:
            n_rows *= self.mesh.shape[a]
        if qb.embeds.shape[0] % n_rows:
            return qb
        from jax.sharding import NamedSharding, PartitionSpec as Pspec

        def row_shard(x):
            spec = Pspec(*((row_axes,) + (None,) * (x.ndim - 1)))
            return jax.device_put(x, NamedSharding(self.mesh, spec))

        return dataclasses.replace(
            qb, embeds=row_shard(qb.embeds), kv_valid=row_shard(qb.kv_valid),
            label_ids=row_shard(qb.label_ids),
            label_masks=row_shard(qb.label_masks))

    def encode_texts(self, texts: Sequence[str]) -> Tuple[jnp.ndarray, jnp.ndarray]:
        """Text-only inputs (no images, no targets) → (embeds, kv_valid)
        in the slotted layout — the reference's bare
        ``get_llm_input_embeds(texts, None)`` path (blip2.py:61-64)."""
        from .tokenizer import Tokenizer  # noqa: F401  (doc aid)

        ids_list = [np.asarray(self.tokenizer.encode(t), np.int32) for t in texts]
        # Same bucket floor as encode_queries (batch_samples min_len):
        # a private floor here would compile a second assemble/forward
        # shape — 30-90s per shape on the remote-compile tunnel.
        L = max(self.min_len,
                ((max(len(x) for x in ids_list) + self.bucket_multiple - 1)
                 // self.bucket_multiple) * self.bucket_multiple)
        B = len(ids_list)
        ids = np.full((B, L), self.tokenizer.pad_token_id, np.int32)
        mask = np.zeros((B, L), np.int32)
        for i, x in enumerate(ids_list):
            ids[i, :len(x)] = x
            mask[i, :len(x)] = 1
        V, d = self.cfg.n_img_tokens, self.cfg.decoder.d_model
        img = jnp.zeros((B, V, d))
        embeds, kv = self._assemble_jit(
            self.params, jnp.asarray(ids), jnp.asarray(mask), img,
            jnp.zeros((B,), jnp.int32))
        return embeds, kv

    def query_end_positions(self, qb: QueryBatch) -> np.ndarray:
        """Full-layout first-target-token position per row: V + prompt_len
        (== the reference's query_range[1] = l_total - l_short + 1)."""
        return qb.prompt_lens + self.cfg.n_img_tokens

    # ---------------- forwards ----------------

    def logits(self, embeds, kv_valid, params=None) -> jnp.ndarray:
        self.counters["decoder_tokens"] += int(embeds.shape[0] * embeds.shape[1])
        return self._logits_jit(self.params if params is None else params,
                                embeds, kv_valid)

    def logits_metrics(self, embeds, kv_valid, label_ids, label_masks,
                       params=None):
        """Fused forward + masked-argmax metrics → (acc [B], pred [B, L]).
        Metric-identical to ``token_accuracy(self.logits(...), ...)`` in
        one device program (no logits materialization between them)."""
        self.counters["decoder_tokens"] += int(embeds.shape[0] * embeds.shape[1])
        return self._logits_metrics_jit(
            self.params if params is None else params, embeds, kv_valid,
            label_ids, label_masks)

    def hidden_at(self, embeds, kv_valid, layer: int, params=None) -> jnp.ndarray:
        """Hidden state after ``layer`` (functional get_mid_module_outpt)."""
        return self._hidden_at_jit(self.params if params is None else params,
                                   embeds, kv_valid, layer)

    def resume_from(self, hidden, kv_valid, layer: int, params=None) -> jnp.ndarray:
        return self._resume_jit(self.params if params is None else params,
                                hidden, kv_valid, layer)

    def prefill(self, embeds, kv_valid, max_len: int, params=None):
        """Full-prompt forward + KV cache (decoder.decoder_prefill)."""
        return self._prefill_jit(self.params if params is None else params,
                                 embeds, kv_valid, max_len)

    def prefill_continue(self, prefix, embeds, kv_valid, max_len: int,
                         params=None):
        """Suffix prefill over a cached prefix KV block
        (decoder.decoder_prefill_continue — the serving prefix cache)."""
        return self._prefill_continue_jit(
            self.params if params is None else params, prefix, embeds,
            kv_valid, max_len)

    def prefill_continue_idx(self, buf, idx, embeds, kv_valid,
                             max_len: int, params=None):
        """Suffix prefill over prefix SLOTS gathered in-program from the
        slot buffer ``buf`` = {"k","v": [layers, cap+1, H, P, hd],
        "valid": [cap+1, P]} at rows ``idx`` [B] (the serve engine's
        prefix cache; row cap is all-zero for text-only requests)."""
        return self._prefill_continue_idx_jit(
            self.params if params is None else params, buf["k"], buf["v"],
            buf["valid"], jnp.asarray(np.asarray(idx, np.int32)), embeds,
            kv_valid, max_len)

    def decode_step(self, cache, token_ids, params=None):
        """One cached decode step from token ids [B] → (logits [B,V], cache)."""
        return self._decode_step_jit(self.params if params is None else params,
                                     cache, jnp.asarray(token_ids))

    def find_closest_tokens(self, embeddings, top_k: int = 1):
        """Nearest vocabulary tokens by cosine similarity
        (``BaseVLLMForEdit.find_closest_tokens``, base.py:187-196).
        embeddings [B, L, d] → (token ids [B, L, k], sims [B, L, k])."""
        emb = self.params["decoder"]["embed_tokens"]
        e = embeddings / jnp.maximum(
            jnp.linalg.norm(embeddings, axis=-1, keepdims=True), 1e-12)
        m = emb / jnp.maximum(jnp.linalg.norm(emb, axis=-1, keepdims=True),
                              1e-12)
        sim = jnp.einsum("bld,vd->blv", e, m)
        sims, toks = jax.lax.top_k(sim, top_k)
        return toks, sims

    def decode_supervised(self, pred_ids, label_masks, row: int) -> str:
        """Decode a row's predictions at supervised positions — the
        reference's ``tokenizer.decode(pre_y[label_masks.to(bool)])``."""
        ids = np.asarray(pred_ids[row])[np.asarray(label_masks[row]) == 1]
        return self.tokenizer.decode(ids.tolist())

    def clear_image_cache(self):
        self._img_free.extend(self._img_cache.values())
        self._img_cache.clear()

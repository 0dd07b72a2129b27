"""Multi-head attention: Pallas TPU flash kernel + XLA reference path.

The reference's only kernel-level artifact is a vendored (and unused)
Triton flash-attention inside the MPT branch (SURVEY.md §2 header). Here
flash attention IS the hot path: every probe evaluation runs full-sequence
teacher-forced decoding (use_cache=False semantics, blip2.py:68-75), so
attention over [vision_tokens + prompt + target] dominates per-layer time
alongside the MLP matmuls.

Masking model: a per-row key-validity mask ``kv_valid`` [B, Lk] ∈ {0,1}
plus an optional causal constraint. This covers every case in the
framework with one code path:
- right-padded text (valid prefix),
- the batched-probe layout where a reserved vision-token slot is masked
  off for rows without an image (valid region is not a prefix),
- full attention for vision towers (mask = None).

Design:
- :func:`xla_attention` — pure-jnp masked attention. Used on CPU (tests),
  as the numerical reference, and as the backward path.
- :func:`_flash_fwd` — Pallas kernel, grid (batch*heads, q-blocks,
  k-blocks) with online-softmax accumulators in VMEM scratch; the
  kv-validity mask is streamed per k-block.
- :func:`multihead_attention` — public entry: dispatches to the flash
  kernel on TPU, XLA elsewhere; wrapped in ``jax.custom_vjp`` whose
  backward runs the Pallas ``_flash_bwd`` dq/dkv kernels when the
  forward took the flash path, and an XLA vjp otherwise.

Layout: q, k, v are [B, H, L, D].
"""
from __future__ import annotations

import functools
import os
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = -1e30


def _flash_compiler_params():
    """Grid semantics for every flash grid (bh, outer, reduction): the
    first two axes are embarrassingly parallel (per-(batch·head) and
    per-output-block); only the last axis carries the online-softmax /
    accumulation dependency. Lets Mosaic split parallel axes across
    cores and reorder freely. Older jax spells the class differently —
    degrade to None (default all-arbitrary) rather than pin a version."""
    sem = ("parallel", "parallel", "arbitrary")
    for cls_name in ("CompilerParams", "TPUCompilerParams"):
        cls = getattr(pltpu, cls_name, None)
        if cls is not None:
            try:
                return {"compiler_params": cls(dimension_semantics=sem)}
            except TypeError:
                continue
    return {}


_CP_KW = _flash_compiler_params()


def xla_attention(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    kv_valid: Optional[jnp.ndarray] = None,
    causal: bool = False,
) -> jnp.ndarray:
    """Reference masked attention. q,k,v: [B, H, Lq/Lk, D] → [B, H, Lq, D].

    ``kv_valid``: [B, Lk] 1 for attendable keys, 0 for masked keys.
    """
    b, h, lq, d = q.shape
    lk = k.shape[2]
    scale = 1.0 / (d ** 0.5)
    s = jnp.einsum(
        "bhqd,bhkd->bhqk", q, k, preferred_element_type=jnp.float32
    ) * scale
    if kv_valid is not None:
        bias = jnp.where(kv_valid.astype(bool), 0.0, NEG_INF)
        s = s + bias[:, None, None, :]
    if causal:
        # offset aligns the causal diagonal when Lq != Lk (prefix-cached
        # decoding); for full-sequence forward Lq == Lk and offset == 0.
        offset = lk - lq
        qi = jnp.arange(lq)[:, None] + offset
        ki = jnp.arange(lk)[None, :]
        s = jnp.where(ki <= qi, s, NEG_INF)
    # Guard fully-masked query rows (e.g. padding queries): renormalize on
    # a finite max so softmax yields a uniform-but-harmless distribution
    # instead of NaN.
    p = jax.nn.softmax(jnp.maximum(s, 2 * NEG_INF), axis=-1)
    o = jnp.einsum("bhqk,bhkd->bhqd", p.astype(v.dtype), v,
                   preferred_element_type=jnp.float32)
    return o.astype(q.dtype)


# ---------------------------------------------------------------------------
# Pallas flash attention (forward)
# ---------------------------------------------------------------------------

def _flash_kernel(
    q_ref,        # VMEM [1, block_q, d]
    k_ref,        # VMEM [1, block_k, d]
    v_ref,        # VMEM [1, block_k, d]
    *rest,        # [mask_ref [1, 8, block_k]] + o_ref +
                  # [lse_ref [1, 8, block_q]] + scratches (m, l, acc)
    causal: bool,
    block_q: int,
    block_k: int,
    sm_scale: float,
    kv_len: int,
    causal_offset: int,
    with_lse: bool = False,
    block_k_minor: int = 0,
    has_mask: bool = True,
):
    # ``has_mask=False`` is the kv_valid=None specialization: NO mask
    # operand exists (one less DMA stream per grid step) and every
    # validity check folds away statically — the variant jax's official
    # causal kernel implements (it has no kv-validity input at all).
    if has_mask:
        mask_ref, rest = rest[0], rest[1:]
    else:
        mask_ref = None
    o_ref, rest = rest[0], rest[1:]
    if with_lse:
        lse_ref, m_scr, l_scr, acc_scr = rest
    else:
        m_scr, l_scr, acc_scr = rest
    iq = pl.program_id(1)
    ik = pl.program_id(2)
    nk = pl.num_programs(2)

    @pl.when(ik == 0)
    def _init():
        m_scr[...] = jnp.full_like(m_scr, NEG_INF)
        l_scr[...] = jnp.zeros_like(l_scr)
        acc_scr[...] = jnp.zeros_like(acc_scr)

    q_start = iq * block_q
    k_start = ik * block_k
    # Causal: the whole k-block is maskable iff k_start > q_end + offset.
    # ``causal_offset`` = kv_len - q_len aligns the diagonal for
    # prefix-cached decoding (Lq < Lk), matching xla_attention.
    run = True
    if causal:
        run = k_start <= q_start + causal_offset + block_q - 1

    # The fetched k-major block is processed in statically-unrolled minor
    # chunks: chunk j+1's s-dot has no data dependency on chunk j's
    # online-softmax update, so Mosaic can overlap the MXU with the VPU
    # across chunks — the same structure the official jax kernel gets
    # from its unrolled pl.loop over block_k within block_k_major.
    # block_k_minor == block_k (or 0) degrades to one chunk.
    bkm = block_k_minor if 0 < block_k_minor < block_k else block_k
    # The knob is user-settable (FLASH_BLOCK_K_MINOR / AB_BKM): a
    # non-divisor would make the last minor chunk's ref slice exceed
    # block_k while the in_range/ks arithmetic assumes full-width chunks
    # — round DOWN to the largest divisor instead of relying on slice
    # clamping staying accidentally correct.
    while block_k % bkm:
        bkm -= 1
    n_minor = (block_k + bkm - 1) // bkm

    @pl.when(run)
    def _compute():
        # Operands stay in their input dtype (bf16 on the hot path): the
        # MXU accumulates in f32 via preferred_element_type, and bf16
        # inputs run at full MXU rate (f32 inputs cost ~4x on v5e).
        q = q_ref[0]

        def _update(s, v):
            # m/l statistics stay FULL-LANE [block_q, 128] end to end:
            # lane-slicing ([:, :1]) and re-broadcasting per step costs
            # cross-lane shuffles; full-lane maximum/multiply are plain
            # elementwise VPU ops (the official jax kernel does the
            # same). Where a wider operand needs the stats, TILE the
            # 128-lane vector (plain vector copies) instead of
            # broadcasting one lane across the block — the remaining
            # lane-broadcasts (m_cur, p_sum) are unavoidable reductions
            # of s. Measured on v5e at L=4096 causal: the [:, :1]
            # broadcast form ran 5.24ms vs jax's 4.32; tiling is the
            # structural difference.
            m_prev = m_scr[...]                          # [block_q, 128]
            m_cur = jnp.max(s, axis=1, keepdims=True)    # [block_q, 1]
            m_new = jnp.maximum(m_prev, m_cur)           # [block_q, 128]
            if s.shape[1] % 128 == 0:
                p = jnp.exp(s - jnp.tile(m_new, (1, s.shape[1] // 128)))
            else:  # non-128-multiple minor chunk: lane-broadcast form
                p = jnp.exp(s - m_new[:, :1])            # [block_q, bkm]
            # No p-select for masked chunks: a row with at least one
            # live key ever seen has real m, so NEG_INF scores underflow
            # exp to exactly 0; a row with NO live key yet has
            # m == NEG_INF and p == exp(0) == 1 everywhere — garbage
            # that (a) is exactly zeroed by corr = exp(NEG_INF - m_real)
            # the moment a live key appears, and (b) for rows that stay
            # fully masked to the end, is zeroed at finalize via the
            # m == NEG_INF check. (The official jax kernel relies on the
            # same underflow.)
            corr = jnp.exp(m_prev - m_new)               # [block_q, 128]
            l_new = l_scr[...] * corr \
                + jnp.sum(p, axis=1, keepdims=True)      # [block_q, 128]
            # acc is [block_q, d]: for d a multiple of 128 scale by the
            # TILED full-lane corr (elementwise); head dims 80/88 fall
            # back to corr's first lane broadcast over d.
            if acc_scr.shape[1] % 128 == 0:
                corr_d = jnp.tile(corr, (1, acc_scr.shape[1] // 128))
            else:
                corr_d = corr[:, :1]
            acc_scr[...] = acc_scr[...] * corr_d + jax.lax.dot_general(
                p.astype(v.dtype), v, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            m_scr[...] = m_new
            l_scr[...] = l_new

        # Whether the grid has ragged tail blocks is STATIC — exact-fit
        # blocks (_fit_block) make this False on the hot shapes.
        ragged = kv_len % block_k != 0

        for j in range(n_minor):
            ks = k_start + j * bkm                # absolute chunk start
            k = k_ref[0, j * bkm:(j + 1) * bkm, :]
            s = jax.lax.dot_general(
                q, k, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32
            ) * sm_scale  # [block_q, bkm]

            if not has_mask:
                # BRANCH-FREE no-mask path (the official jax kernel's
                # structure): apply the causal/tail mask UNCONDITIONALLY
                # as a select on s — masked entries collapse to NEG_INF
                # and exp(s - m) underflows them to 0, so the masked
                # p-select drops out too. Measured on v5e at L=4096
                # causal: the per-chunk @pl.when fast/slow predicate
                # cost more than the iota+select it was skipping
                # (4.92ms branchy vs jax's 4.43 branch-free).
                v = v_ref[0, j * bkm:(j + 1) * bkm, :]
                if causal or ragged:
                    ki = ks + jax.lax.broadcasted_iota(jnp.int32, s.shape, 1)
                    mask = None
                    if causal:
                        qi = (q_start + causal_offset
                              + jax.lax.broadcasted_iota(jnp.int32,
                                                         s.shape, 0))
                        mask = ki <= qi
                    if ragged:
                        bound = ki < kv_len
                        mask = bound if mask is None else mask & bound
                        v = _zero_oob_rows(v, ks, kv_len)
                    s = jnp.where(mask, s, NEG_INF)
                # Every q row keeps >= 1 live key (causal_offset >= 0 and
                # kv_len >= 1), so the unmasked update is exact: masked
                # columns' p underflow to exactly 0.
                _update(s, v)
                continue

            # BRANCH-FREE masked path (same structure as above): apply
            # kv-validity + causal + tail bounds unconditionally as ONE
            # select on s. There is NO p-select: partially-masked rows'
            # NEG_INF scores underflow exp to exact 0 on their own,
            # garbage accumulated before a row's first live key is
            # exactly zeroed by corr = exp(-1e30 - m_real), and rows
            # that stay fully masked to the end (m == NEG_INF, p would
            # be exp(0) = 1 everywhere) are zeroed by the finalize
            # ``dead`` check — weakening THAT check reintroduces
            # garbage outputs for all-masked rows.
            mrow = mask_ref[0, 0, j * bkm:(j + 1) * bkm]
            v = v_ref[0, j * bkm:(j + 1) * bkm, :]
            mask = jnp.broadcast_to(mrow[None, :] > 0, s.shape)
            if causal or ragged:
                ki = ks + jax.lax.broadcasted_iota(jnp.int32, s.shape, 1)
                if causal:
                    qi = (q_start + causal_offset
                          + jax.lax.broadcasted_iota(jnp.int32, s.shape, 0))
                    mask = mask & (ki <= qi)
                if ragged:
                    # Keys past the true kv length are padding reads
                    # with undefined contents; 0·NaN = NaN, so zero the
                    # v rows by SELECT too.
                    mask = mask & (ki < kv_len)
                    v = _zero_oob_rows(v, ks, kv_len)
            _update(jnp.where(mask, s, NEG_INF), v)

    @pl.when(ik == nk - 1)
    def _finalize():
        l = l_scr[:, :1]
        # Fully-masked rows: m never left NEG_INF (and their acc/l hold
        # the p=1 garbage the update's no-select policy admits) — zero
        # their output and mark lse dead. l == 0 additionally covers
        # all-underflow rows.
        dead = jnp.logical_or(m_scr[:, :1] <= NEG_INF / 2, l == 0.0)
        lsafe = jnp.where(dead, 1.0, l)
        o_ref[0] = jnp.where(dead, 0.0,
                             acc_scr[...] / lsafe).astype(o_ref.dtype)
        if with_lse:
            lse = m_scr[:, 0] + jnp.log(lsafe[:, 0])
            lse = jnp.where(dead[:, 0], NEG_INF, lse)
            lse_ref[0] = jnp.broadcast_to(lse[None, :], (8, block_q))


#: Default flash block sizes. Swept on v5e (B2 H32 D128, causal): tiny
#: 128x128 blocks leave the kernel grid-overhead-bound (8.5 TFLOP/s at
#: L=4096); the r5 branch-free kernel peaks at 1024x1024 — 65.5 TF/s at
#: L=4096 causal, BEATING jax's official kernel at its best block
#: config (63.7; interleaved same-process A/B, scripts/ab_flash_vs_jax)
#: and ~5x faster than XLA attention. VMEM at 1024x1024: s+p (f32) 8MB
#: + stats/operands ~2.5MB — fits the 16MB budget.
FLASH_BLOCK_Q = int(os.environ.get("DEVQA_FLASH_BQ", "1024"))
FLASH_BLOCK_K = int(os.environ.get("DEVQA_FLASH_BK", "1024"))
#: Minor-chunk width for the unrolled inner k loop (0 = single chunk).
#: See _flash_kernel: minor chunks let the MXU of chunk j+1 overlap the
#: VPU softmax of chunk j within one grid step. Swept at the r5
#: branch-free 1024x1024 blocks: 512 beats single-chunk by 5-7%
#: (L=4096: 4.0 vs 4.3ms) — past jax's official kernel's 4.33. Non-
#: divisor block sizes round the chunk down to a divisor in-kernel.
FLASH_BLOCK_K_MINOR = int(os.environ.get("DEVQA_FLASH_BKM", "512"))


def _fit_block(length: int, default: int, floor: int) -> int:
    """Largest exact-divisor block ≤ ``default`` (≥ ``floor``), else the
    ragged default. A ragged tail block routes every one of its grid
    steps through the masked slow path AND (causal) misaligns the
    diagonal blocks; exact fits keep the interior fast path hot — at
    L=1280 (IKE-prefixed LLaVA rows) blocks (320, 640) beat the ragged
    (512, 1024) by ~5% end to end (measured, scripts in repo). Lengths
    the defaults already divide (or fit inside) are unchanged."""
    if length <= default or length % default == 0:
        return min(default, length)
    for cand in range(default - 8, floor - 1, -8):
        if length % cand == 0:
            return cand
    return default


def _pad8(x, axis):
    """Zero-pad ``axis`` up to a multiple of 8 (zeros, not garbage — the
    kernels' ragged bounds mask the tail, and zero operands can't NaN)."""
    pad = (-x.shape[axis]) % 8
    if pad == 0:
        return x
    widths = [(0, 0)] * x.ndim
    widths[axis] = (0, pad)
    return jnp.pad(x, widths)


def _flash_fwd(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    kv_valid: jnp.ndarray,
    causal: bool,
    block_q: int = 0,
    block_k: int = 0,
    interpret: bool = False,
    return_lse: bool = False,
    block_k_minor: int = 0,
    _true_lens=None,
):
    b, h, lq, d = q.shape
    lk = k.shape[2]
    if lq % 8 or lk % 8:
        # Non-8-multiple lengths (e.g. the 257-token CLS+patch vision
        # sequences): zero-pad to Mosaic's sublane granularity and run
        # with the TRUE lengths threaded through — padded keys are
        # masked by the ragged bound (kv_len), padded query rows compute
        # harmless values sliced away here. The pad copy is O(L·d),
        # vs the O(L²) f32 score traffic the kernel saves over XLA.
        # Blocks pass through UNRESOLVED so the recursive call keeps the
        # caller's explicit-vs-default distinction.
        out = _flash_fwd(
            _pad8(q, 2), _pad8(k, 2), _pad8(v, 2),
            None if kv_valid is None else _pad8(kv_valid, 1),
            causal, block_q, block_k, interpret, return_lse,
            block_k_minor, _true_lens=(lq, lk))
        if return_lse:
            return out[0][:, :, :lq], out[1][:, :, :lq]
        return out[:, :, :lq]
    defaults = not (block_q or block_k)
    block_q = block_q or FLASH_BLOCK_Q
    block_k = block_k or FLASH_BLOCK_K
    true_lq, true_lk = _true_lens or (lq, lk)
    block_q = _fit_block(lq, block_q, 256)
    block_k = _fit_block(lk, block_k, 512)
    # Whole-sequence blocks whenever the f32 s+p transients PLUS the
    # k/v operand blocks (which scale with lk alone — double-buffered
    # bf16) fit VMEM (~13MB with scratch headroom): at L=1280 causal
    # masked, 1280x1280 beat the exact-fit 640x640 by ~4% interleaved
    # (1.78 vs 1.85ms) — one grid step per (b·h) removes all inner-grid
    # overhead. L=1024 resolves to the swept 1024x1024 default either
    # way; L=2048+ exceeds the budget and keeps the swept blocks. Only
    # when the caller did not pass explicit blocks (sweep scripts win).
    # Budget 15MB: the measured-winning L=1280 d=128 case sums to
    # 14.4MB and compiles comfortably; the short-suffix/long-prefix
    # shapes this bound exists for (e.g. lq=160, lk=8192 → 18.9MB)
    # stay excluded.
    if defaults and lq * lk * 8 + 4 * lk * d * 2 <= 15 * 2**20:
        block_q, block_k = lq, lk
    nq = pl.cdiv(lq, block_q)
    nk = pl.cdiv(lk, block_k)
    sm_scale = 1.0 / (d ** 0.5)
    causal_offset = true_lk - true_lq

    qr = q.reshape(b * h, lq, d)
    kr = k.reshape(b * h, lk, d)
    vr = v.reshape(b * h, lk, d)
    has_mask = kv_valid is not None
    if has_mask:
        # Sublane-tiled mask [B, 8, Lk]: TPU block specs need the
        # 2nd-to-last block dim divisible by 8; broadcasting to 8 rows
        # satisfies tiling at negligible cost.
        maskr = jnp.broadcast_to(
            kv_valid.astype(jnp.int32)[:, None, :], (b, 8, lk))

    num_heads = h
    kernel = functools.partial(
        _flash_kernel,
        causal=causal,
        block_q=block_q,
        block_k=block_k,
        sm_scale=sm_scale,
        kv_len=true_lk,
        causal_offset=causal_offset,
        with_lse=return_lse,
        # The DEFAULT minor chunk applies only when it divides block_k:
        # the in-kernel round-down (e.g. 512 → 320 at a 1280 whole
        # block) measurably LOST on the full-model L=1280 path
        # (flash_speedup 1.36 → 1.25) — an explicit user knob still
        # rounds down as documented.
        block_k_minor=(block_k_minor if block_k_minor
                       else (FLASH_BLOCK_K_MINOR
                             if FLASH_BLOCK_K_MINOR
                             and block_k % FLASH_BLOCK_K_MINOR == 0
                             else 0)),
        # (The old DEVQA_FLASH_ASSUME_VALID benchmark knob is GONE: the
        # branch-free masked path has no per-chunk validity check left
        # to skip. kv_valid=None is the mask-free specialization.)
        has_mask=has_mask,
    )
    # Causal DMA steering: above-diagonal (iq, ik) steps are compute-
    # skipped in the kernel (`run`), but a naive k/v index map would
    # still DMA their never-read blocks — at L=4096 causal that is ~44%
    # of all k/v fetch bandwidth and each skipped step still WAITS on
    # its fetch. Remap skipped steps to block 0 (the next q-row's first
    # k block, so the fetch doubles as its prefetch) — the trick jax's
    # official kernel uses (flash_attention.py kv_index_map: "If the kv
    # block is skipped, prefetch the next valid kv block").
    if causal:
        def _ik_live(iq, ik):
            last_valid = (iq * block_q + causal_offset + block_q - 1) \
                // block_k
            return jnp.where(ik <= last_valid, ik, 0)
    else:
        def _ik_live(iq, ik):
            return ik

    kv_spec = pl.BlockSpec((1, block_k, d),
                           lambda bh, iq, ik: (bh, _ik_live(iq, ik), 0))
    mask_spec = pl.BlockSpec(
        (1, 8, block_k),
        lambda bh, iq, ik: (bh // num_heads, 0, _ik_live(iq, ik)))
    out_specs = pl.BlockSpec((1, block_q, d), lambda bh, iq, ik: (bh, iq, 0))
    out_shape = jax.ShapeDtypeStruct((b * h, lq, d), q.dtype)
    if return_lse:
        out_specs = (out_specs,
                     pl.BlockSpec((1, 8, block_q),
                                  lambda bh, iq, ik: (bh, 0, iq)))
        out_shape = (out_shape,
                     jax.ShapeDtypeStruct((b * h, 8, lq), jnp.float32))
    in_specs = [
        pl.BlockSpec((1, block_q, d), lambda bh, iq, ik: (bh, iq, 0)),
        kv_spec,
        kv_spec,
    ]
    operands = [qr, kr, vr]
    if has_mask:
        in_specs.append(mask_spec)
        operands.append(maskr)
    out = pl.pallas_call(
        kernel,
        grid=(b * h, nq, nk),
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shape,
        scratch_shapes=[
            pltpu.VMEM((block_q, 128), jnp.float32),
            pltpu.VMEM((block_q, 128), jnp.float32),
            pltpu.VMEM((block_q, d), jnp.float32),
        ],
        cost_estimate=pl.CostEstimate(
            flops=4 * b * h * lq * lk * d,
            bytes_accessed=(qr.size + kr.size + vr.size * 2) * q.dtype.itemsize,
            transcendentals=b * h * lq * lk,
        ),
        interpret=interpret,
        **_CP_KW,
    )(*operands)
    if return_lse:
        o, lse = out
        return o.reshape(b, h, lq, d), lse[:, 0, :].reshape(b, h, lq)
    return out.reshape(b, h, lq, d)


# ---------------------------------------------------------------------------
# Pallas flash attention (backward)
# ---------------------------------------------------------------------------
#
# Standard two-kernel flash backward with the forward's logsumexp saved:
#   p  = exp(q·kᵀ·scale − lse)           (re-materialized per block)
#   dv = pᵀ dO
#   ds = p ∘ (dO·vᵀ − D),  D = rowsum(dO ∘ O)   (D precomputed outside)
#   dq = ds·k·scale        (grid (bh, q-blocks, k-blocks), k-accumulated)
#   dk = dsᵀ·q·scale       (grid (bh, k-blocks, q-blocks), q-accumulated)


def _bwd_p_ds(q, k, v, do, lse_row, delta_row, mask, sm_scale):
    """Shared block math → (p, ds), both [block_q, block_k] f32.

    Everything outside ``mask`` is produced by SELECT (jnp.where), never
    by multiplying a zero into it: out-of-bounds tail-block reads have
    undefined contents that may decode as NaN, and 0·NaN = NaN.

    Operands arrive in their input dtype (bf16 hot path — full MXU rate;
    see _flash_kernel); p/ds are f32 statistics.

    ``mask=None`` is the interior fast path (block fully in-range,
    kv-valid, below the causal diagonal, q rows in range): the selects
    and the lse guard drop out entirely — every lse row is finite when
    the block has no masked key."""
    s = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    ) * sm_scale
    # Minor-dim expansion happens on the f32 lse column, never on a bool
    # vector: Mosaic only supports minor-dim insertion for 32-bit types
    # (an i1 [:, None] here fails to compile on real TPU).
    lse_col = lse_row[:, None]                   # [block_q, 1] f32
    dpv = jax.lax.dot_general(
        do, v, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32)
    if mask is None:
        p = jnp.exp(s - lse_col)
        ds = p * (dpv - delta_row[:, None]) * sm_scale
        return p, ds
    m = mask & (lse_col > NEG_INF / 2)
    p = jnp.where(m, jnp.exp(s - lse_col), 0.0)
    ds = jnp.where(m, p * (dpv - delta_row[:, None]) * sm_scale, 0.0)
    return p, ds


def _block_mask(mask_row, k_start, q_start, shape, causal, causal_offset,
                kv_len, q_len):
    ki = k_start + jax.lax.broadcasted_iota(jnp.int32, shape, 1)
    mask = ki < kv_len
    if mask_row is not None:
        mask = jnp.logical_and(
            mask, jnp.broadcast_to(mask_row[None, :] > 0, shape))
    # Ragged q tail: rows past the true q length read undefined padding
    # (lse/delta included) — without this bound the dkv grid, which
    # accumulates ACROSS q-blocks, would sum tail garbage into real
    # keys' gradients.
    qrow = q_start + jax.lax.broadcasted_iota(jnp.int32, shape, 0)
    mask = jnp.logical_and(mask, qrow < q_len)
    if causal:
        qi = (q_start + causal_offset
              + jax.lax.broadcasted_iota(jnp.int32, shape, 0))
        mask = jnp.logical_and(mask, ki <= qi)
    return mask


def _bwd_block_mask(mask_ref, k_start, q_start, shape, causal,
                    causal_offset, kv_len, q_len, block_q, block_k):
    """Mask for the BRANCH-FREE backward path — or None when no term is
    statically needed (no kv mask, non-causal, exact-fit blocks), which
    lets _bwd_p_ds skip every select. Unlike the forward, the backward
    cannot rely on exp underflow for masked columns (s is real there;
    the masked-ness lives in the forward's lse), so masked terms must be
    selected out — but the fwd A/B showed the per-block @pl.when
    predicate costs more than iota+select work, so terms are applied
    unconditionally, gated only on STATIC facts."""
    terms = []
    need_k_iota = causal or (kv_len % block_k != 0)
    if need_k_iota:
        ki = k_start + jax.lax.broadcasted_iota(jnp.int32, shape, 1)
        if causal:
            qi = (q_start + causal_offset
                  + jax.lax.broadcasted_iota(jnp.int32, shape, 0))
            terms.append(ki <= qi)
        if kv_len % block_k != 0:
            terms.append(ki < kv_len)
    if q_len % block_q != 0:
        qrow = q_start + jax.lax.broadcasted_iota(jnp.int32, shape, 0)
        terms.append(qrow < q_len)
    if mask_ref is not None:
        terms.append(jnp.broadcast_to(mask_ref[0, 0][None, :] > 0, shape))
    if not terms:
        return None
    mask = terms[0]
    for t in terms[1:]:
        mask = jnp.logical_and(mask, t)
    return mask


def _zero_oob_rows(x, start, limit):
    """SELECT-zero rows at absolute index ≥ limit (see _bwd_p_ds note:
    multiplying garbage by 0 is not a sanitizer). Full-shape iota —
    Mosaic can't insert a minor dim when broadcasting an [N, 1] mask."""
    rows = start + jax.lax.broadcasted_iota(jnp.int32, x.shape, 0)
    return jnp.where(rows < limit, x, jnp.zeros_like(x))


def _flash_bwd_dq_kernel(q_ref, k_ref, v_ref, *rest, causal, block_q,
                         block_k, sm_scale, kv_len, causal_offset, q_len,
                         has_mask=True):
    if has_mask:
        mask_ref, rest = rest[0], rest[1:]
    else:
        mask_ref = None
    do_ref, lse_ref, delta_ref, dq_ref, acc_scr = rest
    iq = pl.program_id(1)
    ik = pl.program_id(2)
    nk = pl.num_programs(2)

    @pl.when(ik == 0)
    def _init():
        acc_scr[...] = jnp.zeros_like(acc_scr)

    q_start, k_start = iq * block_q, ik * block_k
    run = True
    if causal:
        run = k_start <= q_start + causal_offset + block_q - 1

    @pl.when(run)
    def _compute():
        # Branch-free (see _bwd_block_mask): mask terms applied
        # unconditionally, gated only on STATIC facts — the fwd A/B
        # showed the per-block fast/slow predicate costs more than the
        # iota+select work it skips.
        k, v = k_ref[0], v_ref[0]
        if kv_len % block_k != 0:
            # SELECT-zero ragged k/v tails (ds is 0 there, 0·NaN = NaN)
            k = _zero_oob_rows(k, k_start, kv_len)
            v = _zero_oob_rows(v, k_start, kv_len)
        mask = _bwd_block_mask(mask_ref if has_mask else None, k_start,
                               q_start, (block_q, block_k), causal,
                               causal_offset, kv_len, q_len, block_q,
                               block_k)
        _, ds = _bwd_p_ds(q_ref[0], k, v, do_ref[0], lse_ref[0, 0],
                          delta_ref[0, 0], mask, sm_scale)
        acc_scr[...] += jax.lax.dot_general(
            ds.astype(k.dtype), k, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)

    @pl.when(ik == nk - 1)
    def _finalize():
        dq_ref[0] = acc_scr[...].astype(dq_ref.dtype)


def _flash_bwd_dkv_kernel(q_ref, k_ref, v_ref, *rest, causal, block_q,
                          block_k, sm_scale, kv_len, causal_offset, q_len,
                          has_mask=True):
    if has_mask:
        mask_ref, rest = rest[0], rest[1:]
    else:
        mask_ref = None
    do_ref, lse_ref, delta_ref, dk_ref, dv_ref, dk_scr, dv_scr = rest
    ik = pl.program_id(1)
    iq = pl.program_id(2)
    nq = pl.num_programs(2)

    @pl.when(iq == 0)
    def _init():
        dk_scr[...] = jnp.zeros_like(dk_scr)
        dv_scr[...] = jnp.zeros_like(dv_scr)

    q_start, k_start = iq * block_q, ik * block_k
    run = True
    if causal:
        run = k_start <= q_start + causal_offset + block_q - 1

    @pl.when(run)
    def _compute():
        # Branch-free; this grid accumulates ACROSS q-blocks into real
        # keys' gradients, so ragged q/do tails are SELECT-zeroed (the
        # q-row mask term zeroes their p/ds, but the dots below still
        # multiply the raw operands, and 0·NaN = NaN).
        q, do = q_ref[0], do_ref[0]
        if q_len % block_q != 0:
            q = _zero_oob_rows(q, q_start, q_len)
            do = _zero_oob_rows(do, q_start, q_len)
        mask = _bwd_block_mask(mask_ref if has_mask else None, k_start,
                               q_start, (block_q, block_k), causal,
                               causal_offset, kv_len, q_len, block_q,
                               block_k)
        p, ds = _bwd_p_ds(q, k_ref[0], v_ref[0], do, lse_ref[0, 0],
                          delta_ref[0, 0], mask, sm_scale)
        dv_scr[...] += jax.lax.dot_general(
            p.astype(do.dtype), do, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        dk_scr[...] += jax.lax.dot_general(
            ds.astype(q.dtype), q, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)

    @pl.when(iq == nq - 1)
    def _finalize():
        dk_ref[0] = dk_scr[...].astype(dk_ref.dtype)
        dv_ref[0] = dv_scr[...].astype(dv_ref.dtype)


#: Backward block defaults — swept on v5e at the branch-free structure
#: (L=4096 causal fwd+bwd, interleaved): 256x512 ran 17.5-19.5ms,
#: 512x1024 14.8-15.4ms; 512x512 and 1024x512 within noise of that.
FLASH_BWD_BQ = int(os.environ.get("DEVQA_FLASH_BWD_BQ", "512"))
FLASH_BWD_BK = int(os.environ.get("DEVQA_FLASH_BWD_BK", "1024"))


def _flash_bwd(q, k, v, kv_valid, causal, out, lse, do,
               block_q: int = 0, block_k: int = 0,
               interpret: bool = False, _true_lens=None):
    """Pallas flash backward → (dq, dk, dv). Shapes as in _flash_fwd."""
    block_q = block_q or FLASH_BWD_BQ
    block_k = block_k or FLASH_BWD_BK
    b, h, lq, d = q.shape
    lk = k.shape[2]
    if lq % 8 or lk % 8:
        # Same zero-pad + true-length threading as _flash_fwd: the
        # q_len/kv_len bounds in the kernels mask the padded tails'
        # p/ds, so padded rows/keys contribute exactly zero gradient.
        dq, dk, dv = _flash_bwd(
            _pad8(q, 2), _pad8(k, 2), _pad8(v, 2),
            None if kv_valid is None else _pad8(kv_valid, 1),
            causal, _pad8(out, 2), _pad8(lse, 2), _pad8(do, 2),
            block_q, block_k, interpret, _true_lens=(lq, lk))
        return dq[:, :, :lq], dk[:, :, :lk], dv[:, :, :lk]
    true_lq, true_lk = _true_lens or (lq, lk)
    block_q = _fit_block(lq, block_q, 128)
    block_k = _fit_block(lk, block_k, 256)
    nq = pl.cdiv(lq, block_q)
    nk = pl.cdiv(lk, block_k)
    sm_scale = 1.0 / (d ** 0.5)

    qr = q.reshape(b * h, lq, d)
    kr = k.reshape(b * h, lk, d)
    vr = v.reshape(b * h, lk, d)
    dor = do.reshape(b * h, lq, d)
    has_mask = kv_valid is not None
    if has_mask:
        maskr = jnp.broadcast_to(kv_valid.astype(jnp.int32)[:, None, :],
                                 (b, 8, lk))
    delta = jnp.sum(do.astype(jnp.float32) * out.astype(jnp.float32),
                    axis=-1).reshape(b * h, lq)               # D rows
    lser = jnp.broadcast_to(lse.reshape(b * h, lq)[:, None, :],
                            (b * h, 8, lq))
    deltar = jnp.broadcast_to(delta[:, None, :], (b * h, 8, lq))

    num_heads = h
    causal_offset = true_lk - true_lq
    common = dict(causal=causal, block_q=block_q, block_k=block_k,
                  sm_scale=sm_scale, kv_len=true_lk,
                  causal_offset=causal_offset,
                  q_len=true_lq, has_mask=has_mask)
    # Causal DMA steering (see _flash_fwd): compute-skipped steps must
    # not stall on fetches of blocks they never read. dq's inner axis is
    # ik (trailing skips → steer to 0, the next q-row's first block);
    # dkv's inner axis is iq (leading skips → steer to the first
    # below-diagonal q block of this k row).
    if causal:
        def _ik_live(iq, ik):
            last_valid = (iq * block_q + causal_offset + block_q - 1) \
                // block_k
            return jnp.where(ik <= last_valid, ik, 0)

        def _iq_live(ik, iq):
            first_valid = jnp.maximum(
                0, (ik * block_k - causal_offset) // block_q)
            return jnp.maximum(iq, first_valid)
    else:
        def _ik_live(iq, ik):
            return ik

        def _iq_live(ik, iq):
            return iq

    q_spec = pl.BlockSpec((1, block_q, d), lambda bh, iq, ik: (bh, iq, 0))
    k_spec_q = pl.BlockSpec((1, block_k, d),
                            lambda bh, iq, ik: (bh, _ik_live(iq, ik), 0))
    mask_spec_q = pl.BlockSpec(
        (1, 8, block_k),
        lambda bh, iq, ik: (bh // num_heads, 0, _ik_live(iq, ik)))
    row_spec_q = pl.BlockSpec((1, 8, block_q), lambda bh, iq, ik: (bh, 0, iq))

    dq_specs = [q_spec, k_spec_q, k_spec_q]
    dq_ops = [qr, kr, vr]
    if has_mask:
        dq_specs.append(mask_spec_q)
        dq_ops.append(maskr)
    dq = pl.pallas_call(
        functools.partial(_flash_bwd_dq_kernel, **common),
        grid=(b * h, nq, nk),
        in_specs=dq_specs + [q_spec, row_spec_q, row_spec_q],
        out_specs=q_spec,
        out_shape=jax.ShapeDtypeStruct((b * h, lq, d), q.dtype),
        scratch_shapes=[pltpu.VMEM((block_q, d), jnp.float32)],
        interpret=interpret,
        **_CP_KW,
    )(*dq_ops, dor, lser, deltar)

    # grid order (bh, k-blocks, q-blocks) for the k/v accumulation
    q_spec2 = pl.BlockSpec((1, block_q, d),
                           lambda bh, ik, iq: (bh, _iq_live(ik, iq), 0))
    k_spec2 = pl.BlockSpec((1, block_k, d), lambda bh, ik, iq: (bh, ik, 0))
    mask_spec2 = pl.BlockSpec(
        (1, 8, block_k), lambda bh, ik, iq: (bh // num_heads, 0, ik))
    row_spec2 = pl.BlockSpec((1, 8, block_q),
                             lambda bh, ik, iq: (bh, 0, _iq_live(ik, iq)))
    dkv_specs = [q_spec2, k_spec2, k_spec2]
    dkv_ops = [qr, kr, vr]
    if has_mask:
        dkv_specs.append(mask_spec2)
        dkv_ops.append(maskr)
    dk, dv = pl.pallas_call(
        functools.partial(_flash_bwd_dkv_kernel, **common),
        grid=(b * h, nk, nq),
        in_specs=dkv_specs + [q_spec2, row_spec2, row_spec2],
        out_specs=(k_spec2, k_spec2),
        out_shape=(jax.ShapeDtypeStruct((b * h, lk, d), k.dtype),
                   jax.ShapeDtypeStruct((b * h, lk, d), v.dtype)),
        scratch_shapes=[pltpu.VMEM((block_k, d), jnp.float32),
                        pltpu.VMEM((block_k, d), jnp.float32)],
        interpret=interpret,
        **_CP_KW,
    )(*dkv_ops, dor, lser, deltar)
    return (dq.reshape(b, h, lq, d), dk.reshape(b, h, lk, d),
            dv.reshape(b, h, lk, d))


def _interpret_mode() -> bool:
    import os

    return os.environ.get("DEVQA_FLASH_INTERPRET") == "1"


def _on_tpu() -> bool:
    """Use the Pallas kernel on single-device TPU (multi-device programs
    go through the shard_map path below when a mesh is active). Override
    with DEVQA_FORCE_FLASH=1 / DEVQA_DISABLE_FLASH=1; set
    DEVQA_FLASH_INTERPRET=1 to run the kernel in Pallas interpreter mode
    on CPU (CI coverage of the kernel math without TPU hardware)."""
    import os

    if os.environ.get("DEVQA_DISABLE_FLASH") == "1":
        return False
    if _interpret_mode():
        return True
    if os.environ.get("DEVQA_FORCE_FLASH") == "1":
        return True
    try:
        devs = jax.devices()
        return devs[0].platform == "tpu" and len(devs) == 1
    except RuntimeError:
        return False


#: Sequence length from which the flash kernel beats XLA attention.
#: Benchmarked on v5e (blip2-2.7b eval shapes, head dims 80/88): at
#: L ≤ ~128 XLA's fused attention is FASTER (the L×L score tensor is
#: tiny and the kernel pays lane padding on non-128 head dims) — the
#: whole-pipeline bench runs 6.2 vs 5.1 cases/s with XLA at short L.
#: Flash's O(L) memory advantage is the long-context regime.
FLASH_MIN_KV_LEN = 512


def _flash_worthwhile(q, k) -> bool:
    import os

    # Non-8-multiple lengths are zero-padded inside _flash_fwd/_bwd now
    # (true lengths threaded through), so eligibility is purely a
    # crossover question. Tiny query counts (KV-cached decode steps,
    # short continue-prefills) stay on XLA: the kernel's grid overhead
    # swamps a single q block's work there.
    lq, lk = q.shape[2], k.shape[2]
    if os.environ.get("DEVQA_FORCE_FLASH") == "1" or _interpret_mode():
        return True
    if lq < 64:
        return False
    return lk >= FLASH_MIN_KV_LEN


def _active_mesh():
    """The (dp, tp) mesh in whose context we're tracing, if any.

    ``with mesh:`` (as parallel entry points and the multichip dryrun do)
    exposes the mesh at trace time through jax's thread resources; the
    sharded flash path activates automatically under it.
    """
    try:
        from jax._src import mesh as _mesh_lib  # jax>=0.8 home of the
        thread_resources = _mesh_lib.thread_resources  # context-mesh state
    except Exception:  # older jax: public (since-deprecated) alias
        thread_resources = jax.interpreters.pxla.thread_resources
    try:
        m = thread_resources.env.physical_mesh
        if m is not None and not m.empty:
            return m
    except Exception:
        pass
    return None


def _sharded_flash(q, k, v, kv_valid, causal, mesh):
    """Head/batch-parallel flash attention over a (dp, tp) mesh.

    The kernel math is embarrassingly parallel across batch and heads
    (softmax normalizes per (b, h, q-row)), so shard_map with batch on
    ``dp`` and heads on ``tp`` needs no collectives; GSPMD reshards the
    operands to match (the decoders' tp-sharded QKV projections already
    produce head-sharded activations, so this is a no-op there). The
    TPU-native role of the reference's vendored Triton flash kernel
    (flash_attn_triton.py:1-483), extended to multi-chip.
    """
    from jax.sharding import PartitionSpec as P

    try:
        from jax import shard_map
    except ImportError:  # older jax
        from jax.experimental.shard_map import shard_map
    if kv_valid is None:  # uniform operand structure across the mesh
        kv_valid = jnp.ones((q.shape[0], k.shape[2]), jnp.int32)
    spec = P("dp", "tp", None, None)
    kw = dict(mesh=mesh, in_specs=(spec, spec, spec, P("dp", None)),
              out_specs=spec)
    import inspect

    sig = inspect.signature(shard_map)
    # Replication checking can't see through pallas_call; disable it
    # (the kernel is purely element-parallel over dp/tp shards).
    if "check_vma" in sig.parameters:
        kw["check_vma"] = False
    elif "check_rep" in sig.parameters:
        kw["check_rep"] = False
    f = shard_map(
        lambda q, k, v, m: _flash_fwd(q, k, v, m, causal,
                                      interpret=_interpret_mode()),
        **kw,
    )
    return f(q, k, v, kv_valid)


def _mesh_flash_ok(mesh, q) -> bool:
    import os

    if os.environ.get("DEVQA_DISABLE_FLASH") == "1":
        return False
    if set(mesh.axis_names) != {"dp", "tp"}:
        return False
    b, h = q.shape[0], q.shape[1]
    if b % mesh.shape["dp"] != 0 or h % mesh.shape["tp"] != 0:
        return False
    if _interpret_mode() or os.environ.get("DEVQA_FORCE_FLASH") == "1":
        return True
    return mesh.devices.flat[0].platform == "tpu"


@functools.partial(jax.custom_vjp, nondiff_argnums=(4,))
def _attention(q, k, v, kv_valid, causal):
    mesh = _active_mesh()
    if mesh is not None:
        if _mesh_flash_ok(mesh, q) and _flash_worthwhile(q, k):
            return _sharded_flash(q, k, v, kv_valid, causal, mesh)
        return xla_attention(q, k, v, kv_valid, causal)
    if _on_tpu() and _flash_worthwhile(q, k):
        return _flash_fwd(q, k, v, kv_valid, causal,
                          interpret=_interpret_mode())
    return xla_attention(q, k, v, kv_valid, causal)


def _attention_fwd(q, k, v, kv_valid, causal):
    # Single-device TPU (or interpret mode): Pallas forward that also
    # emits the logsumexp → Pallas backward. Mesh / CPU paths keep the
    # XLA-recompute backward.
    mesh = _active_mesh()
    if mesh is None and _on_tpu() and _flash_worthwhile(q, k):
        o, lse = _flash_fwd(q, k, v, kv_valid, causal,
                            interpret=_interpret_mode(), return_lse=True)
        return o, (q, k, v, kv_valid, o, lse)
    out = _attention(q, k, v, kv_valid, causal)
    return out, (q, k, v, kv_valid, None, None)


def _attention_bwd(causal, res, g):
    q, k, v, kv_valid, o, lse = res
    if o is not None:
        dq, dk, dv = _flash_bwd(q, k, v, kv_valid, causal, o, lse, g,
                                interpret=_interpret_mode())
        return dq, dk, dv, None
    _, vjp = jax.vjp(
        lambda q, k, v: xla_attention(q, k, v, kv_valid, causal), q, k, v
    )
    dq, dk, dv = vjp(g)
    return dq, dk, dv, None


_attention.defvjp(_attention_fwd, _attention_bwd)


def multihead_attention(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    kv_valid: Optional[jnp.ndarray] = None,
    causal: bool = False,
    lengths: Optional[jnp.ndarray] = None,
) -> jnp.ndarray:
    """Public attention entry. q,k,v: [B, H, L, D].

    ``kv_valid``: [B, Lk] key-validity mask (1 = attendable).
    ``lengths``: [B] sugar for a valid-prefix mask.
    """
    lk = k.shape[2]
    if kv_valid is None and lengths is not None:
        kv_valid = (jnp.arange(lk)[None, :]
                    < lengths[:, None]).astype(jnp.int32)
    if kv_valid is not None:
        kv_valid = kv_valid.astype(jnp.int32)
    # kv_valid=None flows through as the NO-MASK kernel specialization:
    # no mask operand, no validity logic (vision towers, full-valid
    # benchmark shapes) — do not upgrade it to an all-ones mask.
    return _attention(q, k, v, kv_valid, causal)

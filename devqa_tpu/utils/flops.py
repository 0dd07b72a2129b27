"""Analytic FLOP models for MFU reporting.

Counts the matmul FLOPs the compiled programs actually perform (padded
shapes, full — not causal-halved — attention score/value products, since
the kernels compute the full padded grid and mask), so

    MFU = counted FLOPs / (wall time x chip peak FLOP/s)

is the fraction of peak the pipeline sustains. Workload definition
matches the reference eval loop (`evaluation/vllm_editor_eval.py:69-135`:
teacher-forced probe forwards + per-edit vision encodes); golden-tested
against XLA's own ``compiled.cost_analysis()['flops']`` in
tests/test_flops.py.

Convention: a [m,k]x[k,n] matmul counts 2*m*k*n FLOPs; element-wise ops,
norms and softmax are ignored (sub-1% on these architectures).
"""
from __future__ import annotations


def decoder_flops_per_token(dcfg, seq_len: int,
                            with_lm_head: bool = True,
                            n_layers: int | None = None) -> float:
    """Per-token forward FLOPs of a decoder at padded length ``seq_len``.

    2*(matmul params)/token: q/k/v/o + MLP per layer, plus the attention
    score (q.k^T) and mix (p.v) products 2*2*seq*d_eff, plus the lm_head.
    Grouped-query attention shrinks k/v projections by kv_heads/n_heads.
    """
    d, ffn = dcfg.d_model, dcfg.d_ffn
    L = dcfg.n_layers if n_layers is None else n_layers
    kv_frac = dcfg.kv_heads / dcfg.n_heads
    # q + o full, k + v possibly grouped
    attn_proj = 2 * (d * d * 2 + d * d * 2 * kv_frac)
    # gated (llama-family) MLPs have gate+up+down = 3 matmuls; relu/gelu 2
    gated = dcfg.arch not in ("opt",) and dcfg.activation in ("silu", "swiglu")
    mlp = 2 * d * ffn * (3 if gated else 2)
    scores = 2 * 2 * seq_len * d  # q.k^T and p.v, full padded grid
    per_layer = attn_proj + mlp + scores
    head = 2 * d * dcfg.vocab_size if with_lm_head else 0
    return float(L * per_layer + head)


def vit_flops_per_image(vcfg) -> float:
    """ViT tower forward FLOPs for one image (patch embed + blocks)."""
    n_patches = (vcfg.image_size // vcfg.patch_size) ** 2
    n_tok = n_patches + (1 if getattr(vcfg, "use_cls_token", True) else 0)
    d, ffn = vcfg.d_model, vcfg.d_ffn
    patch_embed = 2 * n_patches * (vcfg.patch_size ** 2 * 3) * d
    per_tok_layer = 2 * 4 * d * d + 2 * 2 * d * ffn + 2 * 2 * n_tok * d
    return float(patch_embed + vcfg.n_layers * n_tok * per_tok_layer)


def qformer_flops_per_image(qcfg) -> float:
    """Q-Former forward (32 query tokens, cross-attn every
    ``cross_attention_frequency`` layers against the ViT sequence)."""
    d, ffn, nq = qcfg.d_model, qcfg.d_ffn, qcfg.n_query_tokens
    # self-attention + MLP every layer; cross-attention is counted
    # separately by qformer_cross_flops_per_image (needs the ViT length).
    per_layer = nq * (2 * 4 * d * d + 2 * 2 * d * ffn + 2 * 2 * nq * d)
    return float(qcfg.n_layers * per_layer)


def qformer_cross_flops_per_image(qcfg, n_vis: int) -> float:
    d = qcfg.d_model
    enc = qcfg.encoder_width
    n_cross = len(range(0, qcfg.n_layers, qcfg.cross_attention_frequency))
    per_cross = (2 * qcfg.n_query_tokens * d * d          # q proj
                 + 2 * 2 * n_vis * enc * d                # k/v proj
                 + 2 * 2 * qcfg.n_query_tokens * n_vis * d)  # scores+mix
    return float(n_cross * per_cross)


def vision_flops_per_image(vllm_cfg) -> float:
    """Full image-encode FLOPs for a VLLM config: ViT tower + bridge
    (Q-Former cross+self, or projector — projector cost is negligible)."""
    total = vit_flops_per_image(vllm_cfg.vit)
    if vllm_cfg.qformer is not None:
        n_patches = (vllm_cfg.vit.image_size // vllm_cfg.vit.patch_size) ** 2
        n_vis = n_patches + (1 if getattr(vllm_cfg.vit, "use_cls_token", True)
                             else 0)
        total += qformer_flops_per_image(vllm_cfg.qformer)
        total += qformer_cross_flops_per_image(vllm_cfg.qformer, n_vis)
    return total

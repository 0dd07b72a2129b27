"""Analytic FLOP model (utils/flops.py) vs XLA's own cost analysis.

XLA's ``compiled.cost_analysis()['flops']`` counts every op (including
the element-wise/softmax/norm FLOPs we deliberately ignore) BUT counts a
``lax.scan`` body only ONCE — and the decoder/ViT stacks are
scan-stacked. The golden comparison therefore uses 1-layer configs
(scan body == whole stack), where the analytic matmul-only count must
land slightly BELOW XLA's all-ops number but within a modest band; layer
scaling is then validated analytically.
"""
import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from devqa_tpu.core import decoder as dec
from devqa_tpu.core import vllm as V
from devqa_tpu.utils import flops as F


def xla_flops(fn, *args):
    comp = jax.jit(fn).lower(*args).compile()
    ca = comp.cost_analysis()
    if isinstance(ca, list):  # older jaxlib returns one dict per module
        ca = ca[0]
    return float(ca["flops"])


def one_layer(cfg):
    return dataclasses.replace(
        cfg,
        decoder=dataclasses.replace(cfg.decoder, n_layers=1),
        vit=dataclasses.replace(cfg.vit, n_layers=1),
        qformer=dataclasses.replace(cfg.qformer, n_layers=1)
        if cfg.qformer else None)


class TestDecoderFlops:
    @pytest.mark.parametrize("arch", ["opt", "llama"])
    def test_vs_xla_cost_analysis(self, arch):
        cfg = one_layer(V.tiny_vllm_config(arch))
        dcfg = cfg.decoder
        params = V.init_vllm_params(cfg, jax.random.PRNGKey(0))
        B, L = 4, 24
        embeds = jnp.zeros((B, L, dcfg.d_model))
        kv = jnp.ones((B, L), jnp.int32)

        got = xla_flops(
            lambda p, e, k: V.vllm_logits(p, cfg, e, k), params, embeds, kv)
        want = B * L * F.decoder_flops_per_token(dcfg, L)
        # analytic (matmul-only) <= XLA (all ops), within 30%
        assert want <= got * 1.02, (want, got)
        assert want >= 0.70 * got, (want, got)

    def test_layer_scaling_is_linear(self):
        dcfg = V.tiny_vllm_config("opt").decoder
        f1 = F.decoder_flops_per_token(dcfg, 24, with_lm_head=False,
                                       n_layers=1)
        f4 = F.decoder_flops_per_token(dcfg, 24, with_lm_head=False,
                                       n_layers=4)
        assert f4 == pytest.approx(4 * f1)

    def test_7b_scale_sanity(self):
        """vicuna-7b at seq 640: the count must equal the 2*P_matmul +
        attention-score closed form exactly."""
        dcfg = dec.vicuna_7b_config()
        p_matmul = dcfg.n_layers * (4 * dcfg.d_model ** 2
                                    + 3 * dcfg.d_model * dcfg.d_ffn) \
            + dcfg.d_model * dcfg.vocab_size
        got = F.decoder_flops_per_token(dcfg, 640)
        assert got == pytest.approx(
            2 * p_matmul + dcfg.n_layers * 4 * 640 * dcfg.d_model, rel=1e-6)


class TestVisionFlops:
    def test_vit_vs_xla(self):
        cfg = one_layer(V.tiny_vllm_config("opt"))
        from devqa_tpu.core import vit as vit_mod

        params = V.init_vllm_params(cfg, jax.random.PRNGKey(0))
        B = 2
        pixels = jnp.zeros((B, cfg.vit.image_size, cfg.vit.image_size, 3))
        got = xla_flops(
            lambda p, x: vit_mod.vit_forward(p["vit"], cfg.vit, x),
            params, pixels)
        want = B * F.vit_flops_per_image(cfg.vit)
        assert want <= got * 1.02, (want, got)
        assert want >= 0.60 * got, (want, got)  # tiny shapes: overhead-heavy

    def test_full_vision_encode_vs_xla(self):
        """ViT + Q-Former + projection — the per-image encode cost the
        bench charges per cache miss."""
        cfg = one_layer(V.tiny_vllm_config("opt"))
        params = V.init_vllm_params(cfg, jax.random.PRNGKey(0))
        B = 2
        pixels = jnp.zeros((B, cfg.vit.image_size, cfg.vit.image_size, 3))
        got = xla_flops(
            lambda p, x: V.encode_image(p, cfg, x), params, pixels)
        want = B * F.vision_flops_per_image(cfg)
        assert want <= got * 1.05, (want, got)
        assert want >= 0.50 * got, (want, got)  # tiny shapes: overhead-heavy

    def test_blip2_fullsize_magnitude(self):
        """Full BLIP-2 vision encode ~= 0.53 TFLOPs/image (39x1408 ViT at
        257 tokens: 2*(4d^2+2*d*ffn)*257*39 ~= 0.52T, + Q-Former) —
        order-of-magnitude pin so config regressions surface."""
        cfg = V.blip2_opt_2_7b_config()
        f = F.vision_flops_per_image(cfg)
        assert 2e11 < f < 1e12, f

"""Mesh + sharding: sharded forward equals replicated forward; the
multi-chip dryrun executes on the 8-device virtual mesh."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from helpers import make_tiny_vllm

from devqa_tpu.core import vllm as vllm_mod
from devqa_tpu.parallel.mesh import make_mesh
from devqa_tpu.parallel.sharding import shard_params, vllm_param_specs
from jax.sharding import PartitionSpec as P


class TestShardingRules:
    def test_specs(self):
        vllm = make_tiny_vllm()
        specs = vllm_param_specs(vllm.params)
        layers = specs["decoder"]["layers"]
        assert layers["fc1"]["w"] == P(None, None, "tp")
        assert layers["fc2"]["w"] == P(None, "tp", None)
        assert layers["q"]["w"] == P(None, None, "tp")
        assert layers["o"]["w"] == P(None, "tp", None)
        assert specs["decoder"]["embed_tokens"] == P("tp", None)
        # vision tower replicated
        assert specs["vit"]["patch_embed"]["w"] == P()

    def test_sharded_forward_matches_replicated(self):
        vllm = make_tiny_vllm()
        cfg = vllm.cfg
        ids = (jnp.arange(8)[None, :].repeat(4, 0) * 3) % cfg.decoder.vocab_size
        mask = jnp.ones((4, 8), jnp.int32)
        img = jnp.zeros((4, cfg.n_img_tokens, cfg.decoder.d_model))
        has = jnp.zeros((4,), jnp.int32)
        embeds, kv = vllm_mod.assemble_embeds(vllm.params, cfg, ids, mask, img, has)
        ref = vllm_mod.vllm_logits(vllm.params, cfg, embeds, kv)

        mesh = make_mesh(dp=4, tp=2)
        with mesh:
            sparams = shard_params(vllm.params, mesh)
            out = jax.jit(lambda p, e, k: vllm_mod.vllm_logits(p, cfg, e, k))(
                sparams, embeds, kv)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   rtol=2e-4, atol=2e-4)


class TestDryrun:
    def test_dryrun_multichip(self):
        import sys

        sys.path.insert(0, "/root/repo")
        import __graft_entry__ as g

        g.dryrun_multichip(8)

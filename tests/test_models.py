"""Model zoo tests: decoders, ViT, Q-Former, composed VLLM.

The load-bearing properties:
1. split-forward consistency — resume(hidden_at(k)) == full forward
   (the functional nethook replacement must be exact);
2. masked-prefix equivalence — a masked-off vision slot block behaves
   exactly like an absent prefix (what lets image/no-image probes batch);
3. interventions (layer residual, MLP residual) change outputs only
   where they should.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from devqa_tpu.core import decoder as dec
from devqa_tpu.core import vllm as vllm_mod
from devqa_tpu.core.losses import label_loss, logit_kl_loss, token_accuracy
from devqa_tpu.core.qformer import QFormerConfig, init_qformer_params, qformer_forward
from devqa_tpu.core.vit import ViTConfig, init_vit_params, vit_forward


def tiny_decoder(arch):
    cfg = dec.DecoderConfig(
        arch=arch, vocab_size=64, d_model=16, n_layers=4, n_heads=2, d_ffn=32,
        max_positions=64, activation="relu" if arch == "opt" else "silu",
        tie_word_embeddings=(arch == "opt"))
    params = dec.init_decoder_params(cfg, jax.random.PRNGKey(0))
    return cfg, params


@pytest.mark.parametrize("arch", ["opt", "llama"])
class TestDecoder:
    def test_shapes(self, arch):
        cfg, params = tiny_decoder(arch)
        ids = jnp.arange(10)[None, :] % cfg.vocab_size
        h = dec.embed_tokens(params, cfg, ids)
        kv = jnp.ones((1, 10), jnp.int32)
        logits = dec.decoder_apply(params, cfg, h, kv)
        assert logits.shape == (1, 10, cfg.vocab_size)
        assert logits.dtype == jnp.float32

    def test_split_forward_consistency(self, arch):
        cfg, params = tiny_decoder(arch)
        ids = (jnp.arange(12)[None, :] * 7) % cfg.vocab_size
        kv = jnp.ones((1, 12), jnp.int32)
        h0 = dec.embed_tokens(params, cfg, ids)
        full = dec.decoder_apply(params, cfg, h0, kv)
        k = 1
        mid = dec.decoder_forward(params, cfg, h0, kv, lo=0, hi=k + 1)
        resumed = dec.decoder_forward(params, cfg, mid, kv, lo=k + 1)
        logits2 = dec.decoder_logits(params, cfg, resumed)
        np.testing.assert_allclose(full, logits2, rtol=1e-5, atol=1e-5)

    def test_causality(self, arch):
        """Changing a later token must not change earlier logits."""
        cfg, params = tiny_decoder(arch)
        ids1 = (jnp.arange(8)[None, :] * 3) % cfg.vocab_size
        ids2 = ids1.at[0, 6].set((ids1[0, 6] + 1) % cfg.vocab_size)
        kv = jnp.ones((1, 8), jnp.int32)
        l1 = dec.decoder_apply(params, cfg, dec.embed_tokens(params, cfg, ids1), kv)
        l2 = dec.decoder_apply(params, cfg, dec.embed_tokens(params, cfg, ids2), kv)
        np.testing.assert_allclose(l1[0, :6], l2[0, :6], rtol=1e-5, atol=1e-6)
        assert not np.allclose(l1[0, 6:], l2[0, 6:])

    def test_masked_prefix_equivalence(self, arch):
        """[masked 4-slot block | text] must produce the same logits on the
        text positions as the bare text sequence."""
        cfg, params = tiny_decoder(arch)
        V, L = 4, 8
        text_ids = (jnp.arange(L)[None, :] * 5 + 1) % cfg.vocab_size
        text_h = dec.embed_tokens(params, cfg, text_ids)
        bare = dec.decoder_apply(params, cfg, text_h, jnp.ones((1, L), jnp.int32))
        junk = jnp.full((1, V, cfg.d_model), 3.7, text_h.dtype)
        h = jnp.concatenate([junk, text_h], axis=1)
        kv = jnp.concatenate(
            [jnp.zeros((1, V), jnp.int32), jnp.ones((1, L), jnp.int32)], axis=1)
        padded = dec.decoder_apply(params, cfg, h, kv)
        np.testing.assert_allclose(bare[0], padded[0, V:], rtol=1e-4, atol=1e-5)

    def test_layer_residual_intervention(self, arch):
        cfg, params = tiny_decoder(arch)
        ids = (jnp.arange(6)[None, :]) % cfg.vocab_size
        kv = jnp.ones((1, 6), jnp.int32)
        h0 = dec.embed_tokens(params, cfg, ids)
        base = dec.decoder_apply(params, cfg, h0, kv)
        # identity residual → identical
        same = dec.decoder_apply(params, cfg, h0, kv, layer_residual=(2, lambda h: h))
        np.testing.assert_allclose(base, same, rtol=1e-5, atol=1e-6)
        # non-trivial residual → different
        diff = dec.decoder_apply(
            params, cfg, h0, kv, layer_residual=(2, lambda h: h + 0.5))
        assert not np.allclose(base, diff)

    def test_mlp_residual_intervention(self, arch):
        cfg, params = tiny_decoder(arch)
        ids = (jnp.arange(6)[None, :]) % cfg.vocab_size
        kv = jnp.ones((1, 6), jnp.int32)
        h0 = dec.embed_tokens(params, cfg, ids)
        base = dec.decoder_apply(params, cfg, h0, kv)
        zero = dec.decoder_apply(
            params, cfg, h0, kv, mlp_residual=(3, lambda x: jnp.zeros_like(x)))
        np.testing.assert_allclose(base, zero, rtol=1e-5, atol=1e-6)
        diff = dec.decoder_apply(
            params, cfg, h0, kv, mlp_residual=(3, lambda x: x * 0.1))
        assert not np.allclose(base, diff)


class TestMlpInputAtLayer:
    """mlp_input_at_layer must equal what a hook on fc1's input sees —
    verified against decoder_layer's own mlp_residual_fn capture (which
    receives exactly the MLP input)."""

    @pytest.mark.parametrize("arch", ["opt", "llama", "gptj"])
    def test_matches_decoder_layer_hook(self, arch):
        act = {"opt": "relu", "llama": "silu", "gptj": "gelu"}[arch]
        cfg = dec.DecoderConfig(
            arch=arch, vocab_size=64, d_model=16, n_layers=1, n_heads=2,
            d_ffn=32, max_positions=64, activation=act,
            tie_word_embeddings=False)
        params = dec.init_decoder_params(cfg, jax.random.PRNGKey(0))
        p0 = jax.tree_util.tree_map(lambda x: x[0], params["layers"])
        h = jax.random.normal(jax.random.PRNGKey(1), (1, 6, cfg.d_model))
        kv = jnp.ones((1, 6), jnp.int32)
        captured = {}

        def probe(x):
            captured["x"] = x
            return jnp.zeros_like(x)

        positions = dec.positions_from_mask(kv)
        dec.decoder_layer(p0, cfg, h, kv, positions, mlp_residual_fn=probe)
        got = dec.mlp_input_at_layer(p0, cfg, h, kv)
        np.testing.assert_allclose(np.asarray(got),
                                   np.asarray(captured["x"]),
                                   rtol=1e-5, atol=1e-6)

    def test_unsupported_arch_raises(self):
        cfg = dec.DecoderConfig(
            arch="mplug_owl2", vocab_size=64, d_model=16, n_layers=1,
            n_heads=2, d_ffn=32, max_positions=64, activation="silu",
            tie_word_embeddings=False)
        with pytest.raises(NotImplementedError):
            dec.mlp_input_at_layer({}, cfg, jnp.zeros((1, 4, 16)),
                                   jnp.ones((1, 4), jnp.int32))


class TestViT:
    def test_forward(self):
        cfg = ViTConfig(image_size=16, patch_size=4, d_model=32, n_layers=2,
                        n_heads=2, d_ffn=64)
        params = init_vit_params(cfg, jax.random.PRNGKey(1))
        px = jax.random.normal(jax.random.PRNGKey(2), (2, 16, 16, 3))
        out = vit_forward(params, cfg, px)
        assert out.shape == (2, cfg.n_tokens, 32)  # 16 patches + cls

    def test_stop_at_layer(self):
        cfg = ViTConfig(image_size=16, patch_size=4, d_model=32, n_layers=3,
                        n_heads=2, d_ffn=64)
        params = init_vit_params(cfg, jax.random.PRNGKey(1))
        px = jax.random.normal(jax.random.PRNGKey(2), (1, 16, 16, 3))
        h2 = vit_forward(params, cfg, px, stop_at_layer=2, apply_post_ln=False)
        h3 = vit_forward(params, cfg, px, stop_at_layer=3, apply_post_ln=False)
        assert h2.shape == h3.shape
        assert not np.allclose(h2, h3)


class TestQFormer:
    def test_forward(self):
        cfg = QFormerConfig(d_model=24, n_layers=2, n_heads=2, d_ffn=48,
                            n_query_tokens=4, encoder_width=32)
        params = init_qformer_params(cfg, jax.random.PRNGKey(3))
        img = jax.random.normal(jax.random.PRNGKey(4), (2, 17, 32))
        out = qformer_forward(params, cfg, img)
        assert out.shape == (2, 4, 24)


class TestVLLM:
    @pytest.fixture
    def model(self):
        cfg = vllm_mod.tiny_vllm_config("opt")
        params = vllm_mod.init_vllm_params(cfg, jax.random.PRNGKey(5))
        return cfg, params

    def test_end_to_end(self, model):
        cfg, params = model
        px = jax.random.normal(jax.random.PRNGKey(6), (2, 16, 16, 3))
        img_tokens = vllm_mod.encode_image(params, cfg, px)
        assert img_tokens.shape == (2, cfg.n_img_tokens, cfg.decoder.d_model)
        ids = (jnp.arange(10)[None, :].repeat(2, 0) * 3) % cfg.decoder.vocab_size
        mask = jnp.ones((2, 10), jnp.int32)
        has_img = jnp.array([1, 0])
        embeds, kv = vllm_mod.assemble_embeds(params, cfg, ids, mask, img_tokens, has_img)
        assert embeds.shape == (2, 10 + cfg.n_img_tokens, cfg.decoder.d_model)
        logits = vllm_mod.vllm_logits(params, cfg, embeds, kv)
        assert logits.shape[2] == cfg.decoder.vocab_size

    def test_no_image_row_matches_text_only(self, model):
        """Row with has_image=0 in the slotted layout == bare text forward."""
        cfg, params = model
        ids = (jnp.arange(10)[None, :] * 3 + 1) % cfg.decoder.vocab_size
        mask = jnp.ones((1, 10), jnp.int32)
        junk_img = jnp.ones((1, cfg.n_img_tokens, cfg.decoder.d_model)) * 9.0
        embeds, kv = vllm_mod.assemble_embeds(
            params, cfg, ids, mask, junk_img, jnp.array([0]))
        slotted = vllm_mod.vllm_logits(params, cfg, embeds, kv)
        h = dec.embed_tokens(params["decoder"], cfg.decoder, ids)
        bare = dec.decoder_apply(params["decoder"], cfg.decoder, h, mask)
        V = cfg.n_img_tokens
        np.testing.assert_allclose(bare[0], slotted[0, V:], rtol=1e-4, atol=1e-5)

    def test_mid_capture_resume(self, model):
        cfg, params = model
        px = jax.random.normal(jax.random.PRNGKey(7), (1, 16, 16, 3))
        img = vllm_mod.encode_image(params, cfg, px)
        ids = (jnp.arange(8)[None, :]) % cfg.decoder.vocab_size
        embeds, kv = vllm_mod.assemble_embeds(
            params, cfg, ids, jnp.ones((1, 8), jnp.int32), img, jnp.array([1]))
        full = vllm_mod.vllm_logits(params, cfg, embeds, kv)
        k = 2
        mid = vllm_mod.vllm_hidden_at(params, cfg, embeds, kv, k)
        resumed = vllm_mod.vllm_resume_from(params, cfg, mid, kv, k)
        np.testing.assert_allclose(full, resumed, rtol=1e-5, atol=1e-5)

    def test_llava_style_bridge(self):
        cfg = vllm_mod.llava_v15_7b_config()
        # shrink for test
        cfg = cfg.replace(
            vit=cfg.vit.replace(image_size=16, patch_size=4, d_model=32,
                                n_layers=3, n_heads=2, d_ffn=64),
            decoder=cfg.decoder.replace(vocab_size=64, d_model=16, n_layers=2,
                                        n_heads=2, d_ffn=32),
            n_img_tokens=16, vit_feature_layer=2)
        params = vllm_mod.init_vllm_params(cfg, jax.random.PRNGKey(8))
        px = jax.random.normal(jax.random.PRNGKey(9), (1, 16, 16, 3))
        img = vllm_mod.encode_image(params, cfg, px)
        assert img.shape == (1, 16, 16)  # 16 patches (CLS dropped), d_llm=16


class TestImageCache:
    def test_eviction_never_drops_current_call(self):
        """A call whose todo batch overflows the LRU must not evict paths
        the SAME call is about to read (reproduced: KeyError mid-epoch at
        dsn=256 where unique images ≈ 3x cache capacity), and a single
        call may reference more unique paths than the capacity."""
        from helpers import make_tiny_vllm

        vllm = make_tiny_vllm()
        vllm._img_cache_size = 4
        ref_row = np.asarray(vllm.encode_images(["A.jpg"])[0][0])
        # fill with new paths so A.jpg becomes the eviction candidate
        vllm.encode_images(["b%d.jpg" % i for i in range(3)])
        # cached-A + 6 new paths: overflow happens inside this call
        toks, has = vllm.encode_images(
            ["A.jpg"] + ["n%d.jpg" % i for i in range(6)])
        assert toks.shape[0] == 7 and has.sum() == 7
        np.testing.assert_allclose(np.asarray(toks[0]), ref_row)
        # working set larger than capacity in ONE call
        toks2, _ = vllm.encode_images(["m%d.jpg" % i for i in range(10)])
        assert toks2.shape[0] == 10
        # steady-state capacity is re-enforced on the next call
        vllm.encode_images(["z.jpg"])
        assert len(vllm._img_cache) == 4

    def test_ensure_capacity_autosize(self):
        from helpers import make_tiny_vllm

        vllm = make_tiny_vllm()
        cap0 = vllm._img_cache_size
        assert vllm.ensure_image_cache_capacity(cap0 + 500) == cap0 + 500
        assert vllm._img_cache_size == cap0 + 500
        # never shrinks, and the byte bound caps unbounded requests
        itemsize = jnp.dtype(
            vllm.params["decoder"]["embed_tokens"].dtype).itemsize
        row = vllm.cfg.n_img_tokens * vllm.cfg.decoder.d_model * itemsize
        cap = vllm.ensure_image_cache_capacity(10 ** 9, max_bytes=1 << 22)
        assert cap == max(cap0 + 500, (1 << 22) // row)

    def test_unique_image_paths(self):
        from helpers import synth_records, write_records
        import tempfile

        from devqa_tpu.data.schema import EVQA, unique_image_paths
        from devqa_tpu.retrieval.store import hash_encoder

        tmp = tempfile.mkdtemp()
        path, _ = write_records(tmp, 6)
        data = EVQA(path, tmp + "/imgs", encoder=hash_encoder(16))
        paths = unique_image_paths(data.data)
        assert len(paths) >= 6 and None not in paths


class TestLosses:
    def test_label_loss_perfect_prediction(self):
        V = 8
        labels = jnp.array([[1, 2, 3]])
        masks = jnp.array([[1, 1, 0]])
        logits = jax.nn.one_hot(labels, V) * 100.0
        assert float(label_loss(logits, labels, masks)) < 1e-3
        acc, _ = token_accuracy(logits, labels, masks)
        assert float(acc[0]) == 1.0

    def test_kl_zero_for_identical(self):
        logits = jax.random.normal(jax.random.PRNGKey(0), (1, 4, 8))
        masks = jnp.ones((1, 4), jnp.int32)
        assert abs(float(logit_kl_loss(logits, logits, masks))) < 1e-6


class TestMPlugOwl2:
    def test_modality_adaptive_forward(self):
        cfg = dec.DecoderConfig(
            arch="mplug_owl2", vocab_size=64, d_model=16, n_layers=2,
            n_heads=2, d_ffn=32, activation="silu",
            tie_word_embeddings=False, norm_eps=1e-6, max_positions=64)
        params = dec.init_mplug_owl2_decoder_params(cfg, jax.random.PRNGKey(0))
        ids = (jnp.arange(10)[None, :] * 3) % cfg.vocab_size
        h0 = dec.embed_tokens(params, cfg, ids)
        kv = jnp.ones((1, 10), jnp.int32)
        modality = jnp.zeros((1, 10), jnp.int32).at[0, 2:6].set(1)
        h = dec.mplug_owl2_forward(params, cfg, h0, kv, modality)
        logits = dec.decoder_logits(params, cfg, h)
        assert logits.shape == (1, 10, 64)
        assert np.isfinite(np.asarray(logits)).all()
        # modality flip must change outputs (the visual way differs)
        h2 = dec.mplug_owl2_forward(params, cfg, h0, kv,
                                    jnp.zeros((1, 10), jnp.int32))
        assert not np.allclose(np.asarray(h), np.asarray(h2))
        # all-text modality == plain llama layer path on shared weights
        llama_cfg = cfg.replace(arch="llama")
        h3 = dec.decoder_forward(params, llama_cfg, h0, kv)
        np.testing.assert_allclose(np.asarray(h2), np.asarray(h3),
                                   rtol=1e-5, atol=1e-6)


class TestMiniGPT4Composition:
    def test_minigpt4_style_end_to_end(self):
        """MiniGPT-4 shape: llama decoder + qformer bridge + vision slot
        after BOS (vt_range [1, 1+V], minigpt4.py:33-78)."""
        cfg = vllm_mod.tiny_vllm_config("llama", img_slot_pos=1)
        assert cfg.vt_range == (1, 1 + cfg.n_img_tokens)
        params = vllm_mod.init_vllm_params(cfg, jax.random.PRNGKey(11))
        px = jax.random.normal(jax.random.PRNGKey(12), (1, 16, 16, 3))
        img = vllm_mod.encode_image(params, cfg, px)
        ids = (jnp.arange(8)[None, :] + 1) % cfg.decoder.vocab_size
        embeds, kv = vllm_mod.assemble_embeds(
            params, cfg, ids, jnp.ones((1, 8), jnp.int32), img, jnp.array([1]))
        # layout: [BOS][V img slots][text 7]
        assert embeds.shape[1] == 8 + cfg.n_img_tokens
        logits = vllm_mod.vllm_logits(params, cfg, embeds, kv)
        assert np.isfinite(np.asarray(logits)).all()
        # no-image row equals bare text (llama/rope positions via cumsum)
        junk = jnp.full_like(img, 5.0)
        e2, kv2 = vllm_mod.assemble_embeds(
            params, cfg, ids, jnp.ones((1, 8), jnp.int32), junk, jnp.array([0]))
        slotted = vllm_mod.vllm_logits(params, cfg, e2, kv2)
        from devqa_tpu.core import decoder as D
        h = D.embed_tokens(params["decoder"], cfg.decoder, ids)
        bare = D.decoder_apply(params["decoder"], cfg.decoder, h,
                               jnp.ones((1, 8), jnp.int32))
        V = cfg.n_img_tokens
        np.testing.assert_allclose(np.asarray(bare)[0, 1:],
                                   np.asarray(slotted)[0, 1 + V:],
                                   rtol=1e-4, atol=1e-5)


class TestScannedArgmaxHead:
    """decoder_pred_ids: the scanned-vocab argmax head must be
    bit-identical to argmax over the materialized logits (it replaces
    the [rows, V] f32 tensor in the gathered-metric programs)."""

    @pytest.mark.parametrize("arch", ["opt", "llama"])
    def test_matches_materialized_head(self, arch):
        cfg, params = tiny_decoder(arch)
        h = jax.random.normal(jax.random.PRNGKey(3), (2, 5, cfg.d_model))
        full = jnp.argmax(dec.decoder_logits(params, cfg, h), axis=-1)
        pred = dec.decoder_pred_ids(params, cfg, h)
        np.testing.assert_array_equal(np.asarray(pred), np.asarray(full))

    def test_chunked_path_matches(self):
        # vocab > chunk target forces the scan (several chunks)
        cfg = dec.DecoderConfig(
            arch="opt", vocab_size=640, d_model=16, n_layers=2, n_heads=2,
            d_ffn=32, max_positions=64, activation="relu",
            tie_word_embeddings=True)
        params = dec.init_decoder_params(cfg, jax.random.PRNGKey(1))
        h = jax.random.normal(jax.random.PRNGKey(4), (3, 7, cfg.d_model))
        import devqa_tpu.core.decoder as D
        assert D._head_chunk(cfg.vocab_size, target=128, floor=16) == 128
        full = jnp.argmax(dec.decoder_logits(params, cfg, h), axis=-1)
        # exercise the multi-chunk scan by shrinking the chunk target
        orig = D._head_chunk
        try:
            D._head_chunk = lambda V, target=128, floor=16: orig(
                V, target=128, floor=16)
            pred = dec.decoder_pred_ids(params, cfg, h)
        finally:
            D._head_chunk = orig
        np.testing.assert_array_equal(np.asarray(pred), np.asarray(full))

    def test_gptj_biased_head(self):
        cfg = dec.DecoderConfig(
            arch="gptj", vocab_size=64, d_model=16, n_layers=2, n_heads=2,
            d_ffn=32, max_positions=64, activation="gelu",
            tie_word_embeddings=False)
        params = dec.init_decoder_params(cfg, jax.random.PRNGKey(2))
        if "lm_head_b" not in params:
            params = dict(params,
                          lm_head_b=jax.random.normal(
                              jax.random.PRNGKey(5), (cfg.vocab_size,)))
        h = jax.random.normal(jax.random.PRNGKey(6), (2, 4, cfg.d_model))
        full = jnp.argmax(dec.decoder_logits(params, cfg, h), axis=-1)
        pred = dec.decoder_pred_ids(params, cfg, h)
        np.testing.assert_array_equal(np.asarray(pred), np.asarray(full))

"""KV-cached decoding: cached == full-recompute, at every level.

The reference streams with HF use_cache (mPLUG_Owl2 model_worker.py:44);
here the contract is decoder_prefill + decoder_decode_step with
fixed-capacity caches (one compiled decode shape).
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from helpers import make_tiny_vllm

from devqa_tpu.core import decoder as dec
from devqa_tpu.core.tokenizer import ToyTokenizer
from devqa_tpu.editors.llm.session import TextModel
from devqa_tpu.serve.worker import ModelWorker
from devqa_tpu.utils.analysis import generate_fast


def _cfg(arch):
    return dec.DecoderConfig(
        arch=arch, vocab_size=128, d_model=32, n_layers=3, n_heads=2,
        d_ffn=64, activation="relu" if arch == "opt" else "silu",
        tie_word_embeddings=(arch == "opt"), max_positions=64)


class TestDecoderCache:
    @pytest.mark.parametrize("arch", ["opt", "llama"])
    def test_decode_step_matches_full_forward(self, arch):
        """Append tokens one at a time through the cache; logits at each
        new token must equal the full-sequence forward — including a
        'hole-y' validity mask (masked mid-sequence vision slots)."""
        cfg = _cfg(arch)
        params = dec.init_decoder_params(cfg, jax.random.PRNGKey(0))
        rng = np.random.default_rng(1)
        B, L0, EXTRA = 2, 12, 4
        ids = jnp.asarray(rng.integers(0, cfg.vocab_size, (B, L0 + EXTRA)),
                          jnp.int32)
        # row 0: prefix mask; row 1: hole at positions 3..6 (vision slots)
        mask0 = np.zeros((B, L0 + EXTRA), np.int32)
        mask0[0, :L0] = 1
        mask0[1, :L0] = 1
        mask0[1, 3:7] = 0
        prompt_mask = jnp.asarray(mask0)

        embeds = dec.embed_tokens(params, cfg, ids)
        _, cache = dec.decoder_prefill(
            params, cfg, embeds, prompt_mask, L0 + EXTRA)
        got = []
        mask = mask0.copy()
        for t in range(EXTRA):
            tok = jnp.asarray(rng.integers(0, cfg.vocab_size, (B,)), jnp.int32)
            logits, cache = dec.decoder_decode_step(
                params, cfg, cache, params["embed_tokens"][tok])
            # build the equivalent full-sequence input
            for b in range(B):
                slot = np.max(np.nonzero(mask[b])[0]) + 1
                ids = ids.at[b, slot].set(tok[b])
                mask[b, slot] = 1
            full = dec.decoder_apply(params, cfg,
                                     dec.embed_tokens(params, cfg, ids),
                                     jnp.asarray(mask))
            for b in range(B):
                slot = np.max(np.nonzero(mask[b])[0])
                got.append((np.asarray(logits[b]), np.asarray(full[b, slot])))
        for a, bfull in got:
            np.testing.assert_allclose(a, bfull, rtol=2e-4, atol=2e-4)


class TestGenerateFast:
    @pytest.mark.parametrize("arch", ["opt", "llama"])
    def test_cached_equals_full(self, arch):
        cfg = _cfg(arch)
        params = dec.init_decoder_params(cfg, jax.random.PRNGKey(3))
        model = TextModel(params, cfg, ToyTokenizer(vocab_size=128),
                          bucket_multiple=8)
        prompts = ["the capital of france is", "a b c"]
        full = generate_fast(model, prompts, max_new_tokens=6, cached=False)
        cached = generate_fast(model, prompts, max_new_tokens=6, cached=True)
        assert full == cached


class TestWorkerCached:
    def test_cached_worker_matches_stepwise(self):
        vllm = make_tiny_vllm()
        w = ModelWorker(vllm)

        def full_recompute(prompt, image, max_new):
            """Id-preserving full-recompute loop: append the next token's
            embedding directly and re-run the whole sequence."""
            qb = vllm.encode_queries([prompt], [image], [""])
            embeds = np.asarray(qb.embeds)
            mask = np.asarray(qb.kv_valid)
            embeds = np.pad(embeds, ((0, 0), (0, max_new), (0, 0)))
            mask = np.pad(mask, ((0, 0), (0, max_new)))
            table = np.asarray(vllm.params["decoder"]["embed_tokens"])
            logits = vllm.logits(jnp.asarray(embeds), jnp.asarray(mask))
            nxt = int(np.argmax(np.asarray(logits)[0, w._last_text_pos(qb)]))
            stop = (vllm.tokenizer.pad_token_id,
                    getattr(vllm.tokenizer, "eos_token_id", -1))
            out_ids = []
            for _ in range(max_new):
                if nxt in stop:
                    break
                out_ids.append(nxt)
                slot = mask[0].nonzero()[0].max() + 1
                embeds[0, slot] = table[nxt]
                mask[0, slot] = 1
                logits = vllm.logits(jnp.asarray(embeds), jnp.asarray(mask))
                nxt = int(np.argmax(np.asarray(logits)[0, slot]))
            return vllm.tokenizer.decode(out_ids)

        for image in ("img.jpg", None):
            got = w.generate("what is near the tree", image, max_new_tokens=5)
            want = full_recompute("what is near the tree", image, 5)
            assert got == want, (image, got, want)


class TestPrefillContinue:
    @pytest.mark.parametrize("arch", ["opt", "llama"])
    def test_continue_matches_full_prefill(self, arch):
        """Split a prompt at P, prefill the prefix once, continue with
        the suffix: suffix logits and the assembled cache must equal the
        full-sequence decoder_prefill — including a row whose prefix is
        entirely invalid (text-only layout: positions restart at 0)."""
        cfg = _cfg(arch)
        params = dec.init_decoder_params(cfg, jax.random.PRNGKey(0))
        rng = np.random.default_rng(7)
        B, P, LS, ML = 2, 5, 7, 16
        L = P + LS
        ids = jnp.asarray(rng.integers(0, cfg.vocab_size, (B, L)), jnp.int32)
        emb = params["embed_tokens"][ids]
        valid = np.ones((B, L), np.int32)
        valid[1, :P] = 0          # row 1: masked prefix (text-only slot)
        valid[0, 2] = 0           # row 0: a hole inside the prefix
        valid = jnp.asarray(valid)

        full_logits, full_cache = dec.decoder_prefill(
            params, cfg, emb, valid, max_len=ML)
        prefix = {"k": full_cache["k"][:, :, :, :P],
                  "v": full_cache["v"][:, :, :, :P],
                  "valid": full_cache["valid"][:, :P]}
        cont_logits, cont_cache = dec.decoder_prefill_continue(
            params, cfg, prefix, emb[:, P:], valid[:, P:], max_len=ML)

        np.testing.assert_allclose(np.asarray(cont_logits),
                                   np.asarray(full_logits[:, P:]),
                                   rtol=2e-5, atol=2e-5)
        for key in ("k", "v", "valid"):
            np.testing.assert_allclose(np.asarray(cont_cache[key]),
                                       np.asarray(full_cache[key]),
                                       rtol=2e-5, atol=2e-5, err_msg=key)

    def test_decode_after_continue(self):
        """Greedy decode steps from a continued cache match decode steps
        from the full-prefill cache token-for-token."""
        cfg = _cfg("opt")
        params = dec.init_decoder_params(cfg, jax.random.PRNGKey(3))
        rng = np.random.default_rng(11)
        B, P, LS, ML = 2, 4, 6, 20
        ids = jnp.asarray(rng.integers(0, cfg.vocab_size, (B, P + LS)),
                          jnp.int32)
        emb = params["embed_tokens"][ids]
        valid = jnp.ones((B, P + LS), jnp.int32)
        lg_f, cache_f = dec.decoder_prefill(params, cfg, emb, valid, ML)
        prefix = {"k": cache_f["k"][:, :, :, :P],
                  "v": cache_f["v"][:, :, :, :P],
                  "valid": cache_f["valid"][:, :P]}
        _, cache_c = dec.decoder_prefill_continue(
            params, cfg, prefix, emb[:, P:], valid[:, P:], ML)
        tok = jnp.argmax(lg_f[:, -1], -1)
        tf = tc = tok
        for _ in range(4):
            lf, cache_f = dec.decoder_decode_step(
                params, cfg, cache_f, params["embed_tokens"][tf])
            lc, cache_c = dec.decoder_decode_step(
                params, cfg, cache_c, params["embed_tokens"][tc])
            tf, tc = jnp.argmax(lf, -1), jnp.argmax(lc, -1)
            assert tf.tolist() == tc.tolist()

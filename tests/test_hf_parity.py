"""Numerical parity vs HuggingFace torch models (tiny random configs).

Instantiates tiny random HF models on CPU, converts their weights with
core/convert_hf.py, and compares logits end-to-end against the pipelines
the reference builds (blip2.py:22-75, llava.py:25-51). This pins every
structural detail: qkv fusion/order, LN placement, position handling,
RoPE convention, projector shapes, tied heads.
"""
import numpy as np
import pytest
import jax.numpy as jnp

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")

from devqa_tpu.core import convert_hf, decoder as dec, vllm as vllm_mod
from devqa_tpu.core.qformer import QFormerConfig
from devqa_tpu.core.vit import ViTConfig

RTOL, ATOL = 2e-4, 2e-4


def torch_sd(model):
    return convert_hf.torch_state_dict_to_numpy(model)


@pytest.fixture(scope="module")
def tiny_opt():
    from transformers import OPTConfig, OPTForCausalLM

    cfg = OPTConfig(
        vocab_size=64, hidden_size=16, ffn_dim=32, num_hidden_layers=2,
        num_attention_heads=2, max_position_embeddings=64,
        do_layer_norm_before=True, word_embed_proj_dim=16)
    torch.manual_seed(0)
    model = OPTForCausalLM(cfg).eval()
    ours = dec.DecoderConfig(
        arch="opt", vocab_size=64, d_model=16, n_layers=2, n_heads=2, d_ffn=32,
        max_positions=64, activation="relu", tie_word_embeddings=True)
    return model, ours


@pytest.fixture(scope="module")
def tiny_llama():
    from transformers import LlamaConfig, LlamaForCausalLM

    cfg = LlamaConfig(
        vocab_size=64, hidden_size=16, intermediate_size=32,
        num_hidden_layers=2, num_attention_heads=2, num_key_value_heads=2,
        max_position_embeddings=64, tie_word_embeddings=False)
    torch.manual_seed(1)
    model = LlamaForCausalLM(cfg).eval()
    ours = dec.DecoderConfig(
        arch="llama", vocab_size=64, d_model=16, n_layers=2, n_heads=2,
        d_ffn=32, max_positions=64, activation="silu",
        tie_word_embeddings=False, norm_eps=cfg.rms_norm_eps)
    return model, ours


class TestDecoderParity:
    def test_opt(self, tiny_opt):
        model, cfg = tiny_opt
        params = convert_hf.convert_opt(torch_sd(model), cfg)
        ids = np.array([[1, 5, 9, 13, 2, 7]])
        with torch.no_grad():
            ref = model(input_ids=torch.tensor(ids)).logits.numpy()
        h = dec.embed_tokens(params, cfg, jnp.asarray(ids))
        ours = dec.decoder_apply(params, cfg, h, jnp.ones_like(jnp.asarray(ids)))
        np.testing.assert_allclose(np.asarray(ours), ref, rtol=RTOL, atol=ATOL)

    def test_llama(self, tiny_llama):
        model, cfg = tiny_llama
        params = convert_hf.convert_llama(torch_sd(model), cfg)
        ids = np.array([[3, 8, 1, 62, 40]])
        with torch.no_grad():
            ref = model(input_ids=torch.tensor(ids)).logits.numpy()
        h = dec.embed_tokens(params, cfg, jnp.asarray(ids))
        ours = dec.decoder_apply(params, cfg, h, jnp.ones_like(jnp.asarray(ids)))
        np.testing.assert_allclose(np.asarray(ours), ref, rtol=RTOL, atol=ATOL)

    def test_llama_gqa(self):
        """Grouped-query attention (Llama-2/3 style): fewer k/v heads,
        broadcast at attention time."""
        from transformers import LlamaConfig, LlamaForCausalLM

        hf_cfg = LlamaConfig(
            vocab_size=64, hidden_size=16, intermediate_size=32,
            num_hidden_layers=2, num_attention_heads=4,
            num_key_value_heads=2, max_position_embeddings=64,
            tie_word_embeddings=False)
        torch.manual_seed(5)
        model = LlamaForCausalLM(hf_cfg).eval()
        cfg = dec.DecoderConfig(
            arch="llama", vocab_size=64, d_model=16, n_layers=2, n_heads=4,
            n_kv_heads=2, d_ffn=32, max_positions=64, activation="silu",
            tie_word_embeddings=False, norm_eps=hf_cfg.rms_norm_eps)
        params = convert_hf.convert_llama(torch_sd(model), cfg)
        ids = np.array([[3, 8, 1, 62, 40, 7]])
        with torch.no_grad():
            ref = model(input_ids=torch.tensor(ids)).logits.numpy()
        h = dec.embed_tokens(params, cfg, jnp.asarray(ids))
        ours = dec.decoder_apply(params, cfg, h,
                                 jnp.ones_like(jnp.asarray(ids)))
        np.testing.assert_allclose(np.asarray(ours), ref, rtol=RTOL, atol=ATOL)

    def test_gpt2(self):
        """GPT-2 (EasyEdit's stock LLM backbone) rides the OPT block with
        pos_offset=0 + tanh-gelu; pins the Conv1D no-transpose layout and
        the fused c_attn thirds."""
        from transformers import GPT2Config, GPT2LMHeadModel

        hf_cfg = GPT2Config(vocab_size=64, n_embd=16, n_layer=2, n_head=2,
                            n_positions=64)
        torch.manual_seed(2)
        model = GPT2LMHeadModel(hf_cfg).eval()
        cfg = dec.DecoderConfig(
            arch="opt", vocab_size=64, d_model=16, n_layers=2, n_heads=2,
            d_ffn=64, max_positions=64, activation="gelu_new",
            tie_word_embeddings=True, pos_offset=0)
        params = convert_hf.convert_gpt2(torch_sd(model), cfg)
        ids = np.array([[2, 11, 33, 7, 40]])
        with torch.no_grad():
            ref = model(input_ids=torch.tensor(ids)).logits.numpy()
        h = dec.embed_tokens(params, cfg, jnp.asarray(ids))
        ours = dec.decoder_apply(params, cfg, h,
                                 jnp.ones_like(jnp.asarray(ids)))
        np.testing.assert_allclose(np.asarray(ours), ref, rtol=RTOL, atol=ATOL)

    def test_gptj(self):
        """GPT-J (ROME/MEMIT's other stock backbone): parallel residual,
        shared LN, partial interleaved rotary, biased untied head."""
        from transformers import GPTJConfig, GPTJForCausalLM

        hf_cfg = GPTJConfig(vocab_size=64, n_embd=16, n_layer=2, n_head=2,
                            n_positions=64, rotary_dim=4)
        torch.manual_seed(3)
        model = GPTJForCausalLM(hf_cfg).eval()
        cfg = dec.DecoderConfig(
            arch="gptj", vocab_size=64, d_model=16, n_layers=2, n_heads=2,
            d_ffn=64, max_positions=64, activation="gelu_new",
            tie_word_embeddings=False, rotary_dim=4)
        params = convert_hf.convert_gptj(torch_sd(model), cfg)
        ids = np.array([[4, 22, 9, 51, 3, 17]])
        with torch.no_grad():
            ref = model(input_ids=torch.tensor(ids)).logits.numpy()
        h = dec.embed_tokens(params, cfg, jnp.asarray(ids))
        ours = dec.decoder_apply(params, cfg, h,
                                 jnp.ones_like(jnp.asarray(ids)))
        np.testing.assert_allclose(np.asarray(ours), ref, rtol=RTOL, atol=ATOL)

    def test_glm(self):
        """GLM-4 (the ChatGLM lineage; reference edits chatglm via
        trust_remote_code) rides the llama block: pins biased-qkv GQA,
        the fused gate_up split, and partial *interleaved* rotary."""
        from transformers import GlmConfig, GlmForCausalLM

        hf_cfg = GlmConfig(
            vocab_size=64, hidden_size=16, intermediate_size=32,
            num_hidden_layers=2, num_attention_heads=2,
            num_key_value_heads=1, max_position_embeddings=64,
            partial_rotary_factor=0.5, attention_bias=True, head_dim=8,
            pad_token_id=0, tie_word_embeddings=False)
        torch.manual_seed(6)
        model = GlmForCausalLM(hf_cfg).eval()
        cfg = dec.DecoderConfig(
            arch="llama", vocab_size=64, d_model=16, n_layers=2, n_heads=2,
            n_kv_heads=1, d_ffn=32, max_positions=64, activation="silu",
            tie_word_embeddings=False, norm_eps=hf_cfg.rms_norm_eps,
            attn_bias=True, rope_interleaved=True,
            rotary_dim=hf_cfg.head_dim // 2)
        params = convert_hf.convert_glm(torch_sd(model), cfg)
        ids = np.array([[4, 22, 9, 51, 3, 17], [1, 2, 3, 4, 5, 6]])
        with torch.no_grad():
            ref = model(input_ids=torch.tensor(ids)).logits.numpy()
        h = dec.embed_tokens(params, cfg, jnp.asarray(ids))
        ours = dec.decoder_apply(params, cfg, h,
                                 jnp.ones_like(jnp.asarray(ids)))
        np.testing.assert_allclose(np.asarray(ours), ref, rtol=RTOL, atol=ATOL)

    def test_opt_right_padded(self, tiny_opt):
        """Right-padded batch rows must match their unpadded logits on the
        valid region (mask-derived positions)."""
        model, cfg = tiny_opt
        params = convert_hf.convert_opt(torch_sd(model), cfg)
        ids = np.array([[1, 5, 9, 0, 0, 0]])
        mask = np.array([[1, 1, 1, 0, 0, 0]])
        with torch.no_grad():
            ref = model(input_ids=torch.tensor(ids[:, :3])).logits.numpy()
        h = dec.embed_tokens(params, cfg, jnp.asarray(ids))
        ours = dec.decoder_apply(params, cfg, h, jnp.asarray(mask))
        np.testing.assert_allclose(np.asarray(ours)[:, :3], ref, rtol=RTOL, atol=ATOL)


@pytest.fixture(scope="module")
def tiny_blip2():
    from transformers import (Blip2Config, Blip2ForConditionalGeneration,
                              Blip2QFormerConfig, Blip2VisionConfig, OPTConfig)

    vision = Blip2VisionConfig(
        hidden_size=32, intermediate_size=64, num_hidden_layers=2,
        num_attention_heads=2, image_size=28, patch_size=7)
    qformer = Blip2QFormerConfig(
        vocab_size=30, hidden_size=24, num_hidden_layers=2,
        num_attention_heads=2, intermediate_size=48, encoder_hidden_size=32,
        cross_attention_frequency=2)
    text = OPTConfig(
        vocab_size=64, hidden_size=16, ffn_dim=32, num_hidden_layers=2,
        num_attention_heads=2, max_position_embeddings=64,
        do_layer_norm_before=True, word_embed_proj_dim=16)
    cfg = Blip2Config.from_vision_qformer_text_configs(
        vision, qformer, text, num_query_tokens=4)
    torch.manual_seed(2)
    model = Blip2ForConditionalGeneration(cfg).eval()

    ours = vllm_mod.VLLMConfig(
        name="tiny-blip2", bridge="qformer", img_slot_pos=0, n_img_tokens=4,
        vit=ViTConfig(image_size=28, patch_size=7, d_model=32, n_layers=2,
                      n_heads=2, d_ffn=64, fused_qkv=True, pre_layernorm=False),
        qformer=QFormerConfig(d_model=24, n_layers=2, n_heads=2, d_ffn=48,
                              n_query_tokens=4, encoder_width=32,
                              cross_attention_frequency=2),
        decoder=dec.DecoderConfig(
            arch="opt", vocab_size=64, d_model=16, n_layers=2, n_heads=2,
            d_ffn=32, max_positions=64, activation="relu",
            tie_word_embeddings=True),
    )
    return model, ours


class TestBlip2Parity:
    def test_full_pipeline(self, tiny_blip2):
        """Replicates the reference's get_blip2_llm_inpt + get_llm_outpt
        (blip2.py:22-75) in torch and compares against our fused path."""
        model, cfg = tiny_blip2
        sd = torch_sd(model)
        params = convert_hf.convert_blip2(sd, cfg)

        rng = np.random.default_rng(0)
        pixels_t = rng.normal(size=(1, 3, 28, 28)).astype(np.float32)
        ids = np.array([[1, 5, 9, 13]])

        with torch.no_grad():
            pv = torch.tensor(pixels_t)
            image_embeds = model.vision_model(pixel_values=pv).last_hidden_state
            query_tokens = model.query_tokens.expand(image_embeds.shape[0], -1, -1)
            q_out = model.qformer(
                query_embeds=query_tokens,
                encoder_hidden_states=image_embeds,
                encoder_attention_mask=torch.ones(image_embeds.size()[:-1],
                                                  dtype=torch.long),
            ).last_hidden_state
            lm_inputs = model.language_projection(q_out)
            tok = model.language_model.get_input_embeddings()(torch.tensor(ids))
            inputs_embeds = torch.cat([lm_inputs, tok], dim=1)
            attn = torch.ones(inputs_embeds.shape[:2], dtype=torch.long)
            ref = model.language_model(
                inputs_embeds=inputs_embeds, attention_mask=attn,
                use_cache=False).logits.numpy()

        pixels = jnp.asarray(pixels_t.transpose(0, 2, 3, 1))  # NCHW → NHWC
        img_tokens = vllm_mod.encode_image(params, cfg, pixels)
        embeds, kv = vllm_mod.assemble_embeds(
            params, cfg, jnp.asarray(ids), jnp.ones_like(jnp.asarray(ids)),
            img_tokens, jnp.array([1]))
        ours = vllm_mod.vllm_logits(params, cfg, embeds, kv)
        np.testing.assert_allclose(np.asarray(ours), ref, rtol=1e-3, atol=1e-3)


@pytest.fixture(scope="module")
def tiny_llava():
    from transformers import (CLIPVisionConfig, LlamaConfig, LlavaConfig,
                              LlavaForConditionalGeneration)

    vision = CLIPVisionConfig(
        hidden_size=32, intermediate_size=64, num_hidden_layers=3,
        num_attention_heads=2, image_size=28, patch_size=7)
    text = LlamaConfig(
        vocab_size=64, hidden_size=16, intermediate_size=32,
        num_hidden_layers=2, num_attention_heads=2, num_key_value_heads=2,
        max_position_embeddings=64, tie_word_embeddings=False)
    cfg = LlavaConfig(vision_config=vision, text_config=text,
                      image_token_index=63, vision_feature_layer=-2,
                      vision_feature_select_strategy="default")
    torch.manual_seed(3)
    model = LlavaForConditionalGeneration(cfg).eval()

    ours = vllm_mod.VLLMConfig(
        name="tiny-llava", bridge="mlp", img_slot_pos=1, n_img_tokens=16,
        vit=ViTConfig(image_size=28, patch_size=7, d_model=32, n_layers=3,
                      n_heads=2, d_ffn=64, activation="quick_gelu",
                      fused_qkv=False, pre_layernorm=True),
        qformer=None,
        decoder=dec.DecoderConfig(
            arch="llama", vocab_size=64, d_model=16, n_layers=2, n_heads=2,
            d_ffn=32, max_positions=64, activation="silu",
            tie_word_embeddings=False, norm_eps=text.rms_norm_eps),
        vit_feature_layer=2,
    )
    return model, ours


class TestLlavaParity:
    def test_full_pipeline(self, tiny_llava):
        """Replicates llava.py:25-51: penultimate ViT features, drop CLS,
        MLP projector, splice after BOS."""
        model, cfg = tiny_llava
        sd = torch_sd(model)
        params = convert_hf.convert_llava(sd, cfg)

        rng = np.random.default_rng(1)
        pixels_t = rng.normal(size=(1, 3, 28, 28)).astype(np.float32)
        ids = np.array([[1, 7, 11, 20]])  # [BOS, prompt...]

        with torch.no_grad():
            pv = torch.tensor(pixels_t)
            vt = model.vision_tower(pv, output_hidden_states=True)
            feats = vt.hidden_states[-2][:, 1:]
            img = model.multi_modal_projector(feats)
            emb_layer = model.get_input_embeddings()
            tok = emb_layer(torch.tensor(ids))
            inputs_embeds = torch.cat([tok[:, :1], img, tok[:, 1:]], dim=1)
            attn = torch.ones(inputs_embeds.shape[:2], dtype=torch.long)
            lm = model.language_model
            out = lm(inputs_embeds=inputs_embeds, attention_mask=attn,
                     use_cache=False)
            hidden = out.last_hidden_state if hasattr(out, "last_hidden_state") \
                else out.logits
            if hidden.shape[-1] != model.config.text_config.vocab_size:
                head = model.lm_head if hasattr(model, "lm_head") else lm.lm_head
                ref = head(hidden).numpy()
            else:
                ref = hidden.numpy()

        pixels = jnp.asarray(pixels_t.transpose(0, 2, 3, 1))
        img_tokens = vllm_mod.encode_image(params, cfg, pixels)
        embeds, kv = vllm_mod.assemble_embeds(
            params, cfg, jnp.asarray(ids), jnp.ones_like(jnp.asarray(ids)),
            img_tokens, jnp.array([1]))
        ours = vllm_mod.vllm_logits(params, cfg, embeds, kv)
        np.testing.assert_allclose(np.asarray(ours), ref, rtol=1e-3, atol=1e-3)


class TestT5Parity:
    def test_t5(self):
        """T5 (EasyEdit's seq2seq backbone): relative-position buckets,
        unscaled attention, T5LayerNorm, tied head rescale."""
        from transformers import T5Config, T5ForConditionalGeneration

        from devqa_tpu.core import t5 as t5_mod

        hf_cfg = T5Config(vocab_size=96, d_model=32, d_kv=8, d_ff=64,
                          num_layers=2, num_heads=4, num_decoder_layers=2,
                          decoder_start_token_id=0)
        torch.manual_seed(4)
        model = T5ForConditionalGeneration(hf_cfg).eval()
        cfg = t5_mod.T5Config(vocab_size=96, d_model=32, d_kv=8, n_heads=4,
                              d_ff=64, n_enc_layers=2, n_dec_layers=2)
        params = t5_mod.convert_t5(torch_sd(model), cfg)
        ids = np.array([[5, 17, 42, 9, 3], [8, 12, 0, 0, 0]])
        mask = np.array([[1, 1, 1, 1, 1], [1, 1, 0, 0, 0]])
        labels = np.array([[7, 21, 2], [19, 2, 0]])
        with torch.no_grad():
            ref = model(input_ids=torch.tensor(ids),
                        attention_mask=torch.tensor(mask),
                        labels=torch.tensor(labels)).logits.numpy()
        dec_ids = t5_mod.shift_right(jnp.asarray(labels), cfg)
        ours = t5_mod.t5_apply(params, cfg, jnp.asarray(ids),
                               jnp.asarray(mask), dec_ids,
                               jnp.ones_like(dec_ids))
        np.testing.assert_allclose(np.asarray(ours), ref,
                                   rtol=5e-4, atol=5e-4)

    def test_t5_edit_improves_target(self):
        """Param-surgery editing works on the seq2seq stack: a few FT
        steps on one decoder FF weight push the edited answer."""
        import optax

        from devqa_tpu.core import t5 as t5_mod
        from devqa_tpu.utils.surgery import (ParamTarget, add_to_target,
                                             get_target)

        cfg = t5_mod.T5Config(vocab_size=64, d_model=16, d_kv=4, n_heads=4,
                              d_ff=32, n_enc_layers=2, n_dec_layers=2)
        params = t5_mod.init_t5_params(cfg, __import__("jax").random.PRNGKey(0))
        import jax

        ids = jnp.asarray(np.array([[3, 9, 27, 4]]))
        mask = jnp.ones_like(ids)
        labels = jnp.asarray(np.array([[11, 2]]))
        dec_ids = t5_mod.shift_right(labels, cfg)
        t = ParamTarget(("decoder", "layers", "wo", "w"), 1)

        def loss_fn(w):
            p = add_to_target(params, t, w - get_target(params, t))
            logits = t5_mod.t5_apply(p, cfg, ids, mask, dec_ids,
                                     jnp.ones_like(dec_ids))
            logp = jax.nn.log_softmax(logits, -1)
            return -jnp.take_along_axis(logp, labels[..., None], -1).mean()

        w = get_target(params, t)
        l0 = float(loss_fn(w))
        opt = optax.adam(1e-2)
        st = opt.init(w)
        for _ in range(10):
            g = jax.grad(loss_fn)(w)
            up, st = opt.update(g, st, w)
            w = optax.apply_updates(w, up)
        assert float(loss_fn(w)) < l0


class TestBertParity:
    def test_bert(self):
        from transformers import BertConfig as HFBertConfig, BertModel

        from devqa_tpu.core import bert as bert_mod

        hf_cfg = HFBertConfig(
            vocab_size=100, hidden_size=32, num_hidden_layers=2,
            num_attention_heads=2, intermediate_size=64,
            max_position_embeddings=64)
        torch.manual_seed(5)
        model = BertModel(hf_cfg).eval()
        cfg = bert_mod.BertConfig(vocab_size=100, d_model=32, n_layers=2,
                                  n_heads=2, d_ffn=64, max_positions=64)
        params = bert_mod.convert_hf_bert(
            convert_hf.torch_state_dict_to_numpy(model), cfg)
        ids = np.array([[2, 8, 31, 7, 0, 0]])
        mask = np.array([[1, 1, 1, 1, 0, 0]])
        with torch.no_grad():
            ref = model(input_ids=torch.tensor(ids),
                        attention_mask=torch.tensor(mask)).last_hidden_state.numpy()
        ours = bert_mod.bert_encode(params, cfg, input_ids=jnp.asarray(ids),
                                    attention_mask=jnp.asarray(mask))
        np.testing.assert_allclose(np.asarray(ours)[:, :4], ref[:, :4],
                                   rtol=2e-4, atol=2e-4)

    def test_minilm_encoder_from_hf_dir(self, tmp_path):
        """End-to-end oracle for retrieval.encoders.MiniLMEncoder: a
        random tiny BERT saved in HF format on disk loads through
        from_hf_dir (AutoModel + AutoTokenizer + config mapping) and the
        batched encoder call matches torch's mean-pool + L2-normalize —
        the exact sentence-transformers semantics the reference's
        retrieval substrate uses (dataset/vllm.py:89-117). Real MiniLM
        weights stay externally blocked; this pins every line of the
        loading/encoding path on random weights."""
        from transformers import (BertConfig as HFBertConfig, BertModel,
                                  BertTokenizerFast)

        from devqa_tpu.retrieval.encoders import MiniLMEncoder

        d = str(tmp_path / "minilm")
        hf_cfg = HFBertConfig(
            vocab_size=40, hidden_size=32, num_hidden_layers=2,
            num_attention_heads=2, intermediate_size=64,
            max_position_embeddings=64)
        torch.manual_seed(7)
        model = BertModel(hf_cfg).eval()
        model.save_pretrained(d)
        vocab = ["[PAD]", "[UNK]", "[CLS]", "[SEP]", "[MASK]",
                 "the", "cat", "sat", "on", "a", "mat", "dog", "ran",
                 "blue", "sky", "sun", "##s", "paris", "rome", "big"]
        with open(tmp_path / "vocab.txt", "w") as f:
            f.write("\n".join(vocab))
        BertTokenizerFast(vocab_file=str(tmp_path / "vocab.txt"),
                          model_max_length=64).save_pretrained(d)

        enc = MiniLMEncoder.from_hf_dir(d, batch_size=4)
        texts = ["the cat sat on a mat", "a dog ran", "blue sky",
                 "paris rome", "the sun"]  # 5 texts -> ragged tail chunk
        ours = enc(texts)

        tok = enc.tokenizer
        t = tok(texts, padding=True, truncation=True, max_length=64,
                return_tensors="pt")
        with torch.no_grad():
            h = model(**t).last_hidden_state
        m = t["attention_mask"].unsqueeze(-1).float()
        s = (h * m).sum(1) / m.sum(1).clamp(min=1e-9)
        ref = (s / s.norm(dim=-1, keepdim=True).clamp(min=1e-12)).numpy()
        assert ours.shape == ref.shape == (5, 32)
        np.testing.assert_allclose(ours, ref, rtol=2e-4, atol=2e-4)
        # normalized embeddings: retrieval cosine = dot
        np.testing.assert_allclose(np.linalg.norm(ours, axis=-1),
                                   np.ones(5), rtol=1e-5, atol=1e-5)

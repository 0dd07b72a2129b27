"""Model/editor factory — the ``utils/__init__.py`` of the reference
(``get_full_model_name`` :29, ``load_vllm_for_edit`` :111,
``load_vllm_editor`` if/elif registry :126-175), table-driven.
"""
from __future__ import annotations

import os
from typing import Optional

import jax
import jax.numpy as jnp

MODEL_NAME_MAP = {
    "blip2": "blip2-opt-2.7b",
    "blip2-opt-2.7b": "blip2-opt-2.7b",
    "llava": "llava-v1.5-7b",
    "llava-v1.5-7b": "llava-v1.5-7b",
    "minigpt4": "minigpt-4-vicuna-7b",
    "minigpt-4-vicuna-7b": "minigpt-4-vicuna-7b",
    "owl2": "mplug-owl2-llama2-7b",
    "mplug-owl2": "mplug-owl2-llama2-7b",
    "mplug-owl2-llama2-7b": "mplug-owl2-llama2-7b",
    "qwen-vl": "qwen-vl",
    "qwenvl": "qwen-vl",
    # CPU-sized backbones for smoke tests and CLI dry runs (-mn tiny
    # exercises the full evaluate/train path in seconds, no checkpoint)
    "tiny": "tiny-opt",
    "tiny-opt": "tiny-opt",
    "tiny-llama": "tiny-llama",
}

EDITOR_NAMES = ("null", "ike", "ft_vl", "liveedit", "mend_vl", "serac_vl",
                "tp_vl", "lte_vl", "recipe_vl", "lemoe_vl")


def get_full_model_name(name: str) -> str:
    key = name.lower()
    if key not in MODEL_NAME_MAP:
        raise ValueError("unknown model name: %s (known: %s)"
                         % (name, sorted(set(MODEL_NAME_MAP.values()))))
    return MODEL_NAME_MAP[key]


def model_config(full_name: str):
    from ..core import vllm as V

    return {
        "blip2-opt-2.7b": V.blip2_opt_2_7b_config,
        "llava-v1.5-7b": V.llava_v15_7b_config,
        "minigpt-4-vicuna-7b": V.minigpt4_vicuna_7b_config,
        "mplug-owl2-llama2-7b": V.mplug_owl2_llama2_7b_config,
        "qwen-vl": V.qwen_vl_7b_config,
        "tiny-opt": lambda: V.tiny_vllm_config("opt"),
        "tiny-llama": lambda: V.tiny_vllm_config("llama"),
    }[full_name]()


def load_vllm_for_edit(
    model_name: str,
    weights_dir: Optional[str] = None,
    dtype=jnp.bfloat16,
    image_provider=None,
    tokenizer=None,
    seed: int = 0,
):
    """Build a JaxVLLM for the named backbone.

    ``weights_dir``: a local HF checkpoint directory → torch-load +
    convert (core/convert_hf.py). None → random init (benchmarks, tests;
    this environment has no model downloads).
    """
    from ..core import vllm as V
    from ..core.tokenizer import HFTokenizerAdapter, ToyTokenizer
    from ..core.wrapper import JaxVLLM
    from ..data.images import FileImageProvider, SyntheticImageProvider

    cfg = model_config(get_full_model_name(model_name))
    tok_dir = weights_dir
    from ..cli.convert import is_converted_dir, load_converted

    if weights_dir is not None and is_converted_dir(weights_dir):
        # Pre-converted orbax pytree (cli/convert.py): restore directly,
        # no torch/transformers on the load path.
        params, meta = load_converted(weights_dir)
        assert meta["model"] == cfg.name, (meta, cfg.name)
        params = jax.tree.map(lambda x: jnp.asarray(x, dtype), params)
        tok_sub = os.path.join(weights_dir, "tokenizer")
        if tokenizer is None and os.path.isdir(tok_sub):
            import transformers

            tokenizer = HFTokenizerAdapter(
                transformers.AutoTokenizer.from_pretrained(tok_sub))
        if tokenizer is None:
            import sys

            print("WARNING: converted dir %s has no tokenizer/ — using "
                  "ToyTokenizer; real weights will produce garbage "
                  "(re-run cli.convert, which saves it)." % weights_dir,
                  file=sys.stderr)
            tokenizer = ToyTokenizer(vocab_size=cfg.decoder.vocab_size)
        if image_provider is None:
            image_provider = FileImageProvider(cfg.vit.image_size)
        return JaxVLLM(cfg, params, tokenizer, image_provider)
    if weights_dir is not None:
        from ..core import convert_hf

        import transformers

        if cfg.bridge == "qformer" and "blip2" in cfg.name:
            hf = transformers.Blip2ForConditionalGeneration.from_pretrained(
                weights_dir)
            params = convert_hf.convert_blip2(
                convert_hf.torch_state_dict_to_numpy(hf), cfg)
        elif cfg.bridge == "mlp":
            hf = transformers.LlavaForConditionalGeneration.from_pretrained(
                weights_dir)
            params = convert_hf.convert_llava(
                convert_hf.torch_state_dict_to_numpy(hf), cfg)
        elif cfg.bridge == "abstractor":
            # mPLUG-Owl2 ships as a custom-code HF repo; load the shard
            # files directly (no trust_remote_code in a zero-egress image).
            sd = convert_hf.load_torch_dir(weights_dir)
            params = convert_hf.convert_mplug_owl2(sd, cfg)
        elif cfg.bridge == "resampler":
            sd = convert_hf.load_torch_dir(weights_dir)
            params = convert_hf.convert_qwen_vl(sd, cfg)
        else:
            # MiniGPT-4: LAVIS-style checkpoints. ``weights_dir`` holds the
            # .pth file(s) the reference composes (eva/blip2-qformer/
            # stage-2 minigpt4 ckpts — minigpt4.py:45-70) and optionally a
            # "llama"/"vicuna" HF subdirectory for the decoder.
            import glob

            paths = sorted(glob.glob(os.path.join(weights_dir, "*.pth")))
            if not paths:
                raise FileNotFoundError(
                    "no .pth LAVIS checkpoints in %s" % weights_dir)
            llama_dir = next(
                (p for p in (os.path.join(weights_dir, n)
                             for n in ("llama", "vicuna", "llama_model"))
                 if os.path.isdir(p)), None)
            sd = convert_hf.merge_minigpt4_checkpoints(paths, llama_dir)
            params = convert_hf.convert_minigpt4(sd, cfg)
            if llama_dir is not None:
                tok_dir = llama_dir  # Vicuna tokenizer lives with the LLM
        params = jax.tree.map(lambda x: jnp.asarray(x, dtype), params)
        if tokenizer is None:
            tokenizer = HFTokenizerAdapter(
                transformers.AutoTokenizer.from_pretrained(tok_dir))
        if image_provider is None:
            image_provider = FileImageProvider(cfg.vit.image_size)
    else:
        params = V.init_vllm_params(cfg, jax.random.PRNGKey(seed), dtype)
        if tokenizer is None:
            tokenizer = ToyTokenizer(vocab_size=cfg.decoder.vocab_size)
        if image_provider is None:
            image_provider = SyntheticImageProvider(cfg.vit.image_size)
    return JaxVLLM(cfg, params, tokenizer, image_provider)


def get_editor_config_path(editor_name: str, full_model_name: str,
                           configs_dir: str = "configs") -> str:
    return os.path.join(configs_dir, editor_name, full_model_name + ".yaml")


def load_vllm_editor(
    editor_name: str,
    model_name: str,
    *,
    vllm=None,
    weights_dir: Optional[str] = None,
    config_path: Optional[str] = None,
    configs_dir: str = "configs",
    ckpt_path: Optional[str] = None,
    sentence_encoder=None,
    ike_store_path: Optional[str] = None,
    seed: int = 0,
):
    """Name → configured editor instance (the reference's registry chain,
    utils/__init__.py:126-175)."""
    editor_name = editor_name.lower()
    full = get_full_model_name(model_name)
    if vllm is None:
        vllm = load_vllm_for_edit(full, weights_dir, seed=seed)
    if sentence_encoder is None:
        from ..retrieval.store import hash_encoder

        sentence_encoder = hash_encoder(384)

    cpath = config_path or get_editor_config_path(editor_name, full, configs_dir)
    has_cfg_file = os.path.exists(cpath)

    def cfg_of(cls):
        return cls.from_yaml(cpath) if has_cfg_file else cls(edit_model_name=full)

    if editor_name == "null":
        from ..editors.null import NullEditor

        return NullEditor(vllm)
    if editor_name == "ft_vl":
        from ..editors.ft_vl import FTvl, FTvlConfig

        return FTvl(vllm, cfg_of(FTvlConfig))
    if editor_name == "liveedit":
        from ..editors.liveedit import LiveEditConfig, LiveEditTrainable

        editor = LiveEditTrainable(vllm, cfg_of(LiveEditConfig), seed=seed)
    elif editor_name == "mend_vl":
        from ..editors.mend_vl import MENDvlConfig, MENDvlTrainable

        editor = MENDvlTrainable(vllm, cfg_of(MENDvlConfig), seed=seed)
    elif editor_name == "serac_vl":
        from ..editors.serac_vl import SERACvlConfig, SERACvlTrainable

        editor = SERACvlTrainable(vllm, cfg_of(SERACvlConfig), seed=seed)
    elif editor_name == "tp_vl":
        from ..editors.tp_vl import TPvl, TPvlConfig

        return TPvl(vllm, cfg_of(TPvlConfig), seed=seed)
    elif editor_name == "lte_vl":
        from ..editors.lte_vl import LTEvlConfig, LTEvlTrainable

        editor = LTEvlTrainable(vllm, cfg_of(LTEvlConfig), sentence_encoder,
                                seed=seed)
    elif editor_name == "recipe_vl":
        from ..editors.recipe_vl import RECIPEvlConfig, RECIPEvlTrainable

        editor = RECIPEvlTrainable(vllm, cfg_of(RECIPEvlConfig),
                                   vllm.tokenizer, seed=seed)
    elif editor_name == "lemoe_vl":
        from ..editors.lemoe_vl import LEMoEvl, LEMoEvlConfig

        return LEMoEvl(vllm, cfg_of(LEMoEvlConfig), seed=seed)
    elif editor_name == "ike":
        if ike_store_path is None:
            raise ValueError(
                "IKE needs a demonstration store: pass ike_store_path "
                "(cli: -st store.pkl, built by cli.build_store --kind ike).")
        from ..editors.ike import IKE, IKEConfig
        from ..retrieval.store import EmbeddingStore

        store = EmbeddingStore.load(ike_store_path)
        return IKE(vllm, cfg_of(IKEConfig), store, sentence_encoder)
    else:
        raise ValueError("unknown editor: %s (known: %s)"
                         % (editor_name, EDITOR_NAMES))

    if ckpt_path:
        from ..train.loop import load_editor_ckpt

        load_editor_ckpt(editor, ckpt_path)
    return editor

"""One-time checkpoint conversion: HF/LAVIS torch weights → an orbax
pytree the registry loads directly (no torch, no per-run conversion).

    python -m devqa_tpu.cli.convert -mn blip2 -wd /path/to/hf-ckpt \\
        -o converted/blip2

The reference re-loads torch checkpoints every run
(``utils/__init__.py:111`` load_vllm_for_edit → HF from_pretrained);
here conversion is a deployment step: convert once, then
``load_vllm_for_edit(..., weights_dir=<out dir>)`` restores the pytree
via orbax (memory-mapped, no transformers import on the serving path).
"""
from __future__ import annotations

import argparse
import json
import os


def save_converted(params, cfg_name: str, out_dir: str,
                   tokenizer_src: str = None) -> None:
    import orbax.checkpoint as ocp

    out_dir = os.path.abspath(out_dir)
    ocp.PyTreeCheckpointer().save(os.path.join(out_dir, "params"), params,
                                  force=True)
    with open(os.path.join(out_dir, "devqa_model.json"), "w") as f:
        json.dump({"model": cfg_name, "format": "devqa_tpu-orbax-v1"}, f)
    if tokenizer_src:
        # The converted dir must be self-contained: without a saved
        # tokenizer the registry load silently falls back to ToyTokenizer
        # and real weights produce garbage with no error.
        save_tokenizer(tokenizer_src, out_dir)


def save_tokenizer(src_dir: str, out_dir: str) -> bool:
    """Copy the source checkpoint's tokenizer into <out_dir>/tokenizer
    (the path registry.load_vllm_for_edit probes). Returns success."""
    import sys

    try:
        import transformers

        tok = transformers.AutoTokenizer.from_pretrained(src_dir)
        tok.save_pretrained(os.path.join(out_dir, "tokenizer"))
        return True
    except Exception as e:
        print("WARNING: could not save tokenizer from %s (%r). The "
              "converted dir will fall back to ToyTokenizer — real "
              "weights will produce garbage. Copy a tokenizer into "
              "%s/tokenizer before evaluating." % (src_dir, e, out_dir),
              file=sys.stderr)
        return False


def is_converted_dir(path: str) -> bool:
    return os.path.exists(os.path.join(path, "devqa_model.json"))


def load_converted(path: str):
    import orbax.checkpoint as ocp

    with open(os.path.join(path, "devqa_model.json")) as f:
        meta = json.load(f)
    params = ocp.PyTreeCheckpointer().restore(
        os.path.abspath(os.path.join(path, "params")))
    return params, meta


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("-mn", "--model_name", required=True)
    p.add_argument("-wd", "--weights_dir", required=True,
                   help="HF checkpoint dir (blip2/llava) or LAVIS .pth dir "
                        "(minigpt4) or shard dir (owl2/qwen-vl)")
    p.add_argument("-o", "--out_dir", required=True)
    args = p.parse_args(argv)

    from ..utils.registry import get_full_model_name, load_vllm_for_edit

    full = get_full_model_name(args.model_name)
    vllm = load_vllm_for_edit(full, weights_dir=args.weights_dir)
    save_converted(vllm.params, full, args.out_dir,
                   tokenizer_src=args.weights_dir)
    print("saved %s params to %s" % (full, args.out_dir))


if __name__ == "__main__":
    main()

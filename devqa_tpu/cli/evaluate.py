"""Evaluation CLI — the reference's ``test_vllm_edit.py``.

    python -m devqa_tpu.cli.evaluate -en liveedit -mn blip2 -sen 1 \\
        -dn EVQA -dsn 500 [-ckpt records/.../Best] [-wd /path/to/hf-ckpt]

Flags mirror test_vllm_edit.py:7-18; already-evaluated runs short-circuit
(:38-41).
"""
from __future__ import annotations

import argparse
import os
import sys


def get_args():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("-en", "--editor_name", type=str, required=True)
    p.add_argument("-mn", "--edit_model_name", type=str, required=True)
    p.add_argument("-sen", "--sequential_edit_n", type=int, default=1)
    p.add_argument("-enp", "--eval_name_postfix", type=str, default="")
    p.add_argument("-ckpt", "--editor_ckpt_path", type=str, default=None)
    p.add_argument("-dn", "--data_name", type=str, default="EVQA",
                   choices=["EVQA", "EIC", "VLKEB"])
    p.add_argument("-dp", "--data_path", type=str, default=None,
                   help="dataset JSON (defaults to data/<name> layout)")
    p.add_argument("-ir", "--img_root_dir", type=str, default="data/images")
    p.add_argument("-dsn", "--data_sample_n", type=int, default=None)
    p.add_argument("-wd", "--weights_dir", type=str, default=None,
                   help="local HF checkpoint dir (random init if absent)")
    p.add_argument("-cfgs", "--configs_dir", type=str, default="configs")
    p.add_argument("-res", "--results_dir", type=str, default="eval_results")
    return p.parse_args()


DEFAULT_DATA = {
    "EVQA": "data/easy-edit-mm/vqa/vqa_eval.json",
    "EIC": "data/easy-edit-mm/caption/caption_eval_edit.json",
    "VLKEB": "data/VLKEB/eval.json",
}


def main():
    args = get_args()
    from ..data import schema
    from ..eval.harness import EditorEvaluation
    from ..retrieval.store import hash_encoder
    from ..utils.registry import get_full_model_name, load_vllm_editor

    editor_name = args.editor_name.lower()
    full = get_full_model_name(args.edit_model_name)
    eval_name = args.data_name.upper()
    if args.eval_name_postfix:
        eval_name = "%s-%s" % (eval_name, args.eval_name_postfix)
    done = os.path.join(args.results_dir, editor_name, full, eval_name,
                        "single_edit")
    if os.path.exists(done):
        print("Has evaluated: %s" % done)
        sys.exit()

    editor = load_vllm_editor(
        editor_name, full, weights_dir=args.weights_dir,
        configs_dir=args.configs_dir, ckpt_path=args.editor_ckpt_path)
    data_cls = {"EVQA": schema.EVQA, "EIC": schema.EIC,
                "VLKEB": schema.VLKEB}[args.data_name]
    data_path = args.data_path or DEFAULT_DATA[args.data_name]
    data = data_cls(data_path, args.img_root_dir,
                    data_n=args.data_sample_n, encoder=hash_encoder(384))
    ev = EditorEvaluation(editor, data, eval_name, args.results_dir)
    ev.evaluate_sequential_edit(args.sequential_edit_n, False, None)


if __name__ == "__main__":
    main()

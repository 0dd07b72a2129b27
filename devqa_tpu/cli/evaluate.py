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
    p.add_argument("-fused", "--fused", action="store_true",
                   help="fused TPU measurement pipeline (metric-identical "
                        "to the reference protocol; batches all probes + "
                        "hoists pre-edit passes — the bench.py fast path)")
    p.add_argument("-ltk", "--loc_topk", type=int, default=None,
                   help="EasyEdit-side locality top-k agreement "
                        "(multimodal_editor.py:977-1007; k=1 text / k=N "
                        "multimodal). Defaults to 10 for ike/hice, off "
                        "otherwise.")
    p.add_argument("-mr", "--max_rows", type=int, default=60,
                   help="probe rows per fused device batch")
    p.add_argument("-tp", "--tensor_parallel", type=int, default=1,
                   help="shard the backbone Megatron-style over tp devices")
    p.add_argument("-dpx", "--data_parallel", type=int, default=None,
                   help="shard probe rows over dp devices "
                        "(default: n_devices // tp when -tp given)")
    p.add_argument("-rt", "--retrieval", type=str, default="hash",
                   choices=["hash", "minilm"],
                   help="probe-retrieval sentence encoder (the reference "
                        "uses all-MiniLM-L6-v2, dataset/vllm.py:89-117; "
                        "hash is the zero-checkpoint stand-in)")
    p.add_argument("-red", "--retrieval_encoder_dir", type=str, default=None,
                   help="local sentence-transformer checkpoint dir "
                        "(required with -rt minilm)")
    p.add_argument("-st", "--store_path", type=str, default=None,
                   help="pre-built embedding store .pkl (reference-format "
                        "sentences/embeddings/images/prompts pickle)")
    return p.parse_args()


def build_retriever(args):
    """-rt/-red/-st → a Retriever (or None to build from the dataset)."""
    from ..retrieval.store import EmbeddingStore, Retriever, hash_encoder

    if args.retrieval == "minilm":
        if not args.retrieval_encoder_dir:
            raise SystemExit("-rt minilm requires -red <encoder dir>")
        from ..retrieval.encoders import MiniLMEncoder

        encoder = MiniLMEncoder.from_hf_dir(args.retrieval_encoder_dir)
    else:
        encoder = hash_encoder(384)
    if args.store_path:
        return Retriever(EmbeddingStore.load(args.store_path), encoder), encoder
    return None, encoder


DEFAULT_DATA = {
    "EVQA": "data/easy-edit-mm/vqa/vqa_eval.json",
    "EIC": "data/easy-edit-mm/caption/caption_eval_edit.json",
    "VLKEB": "data/VLKEB/eval.json",
}


def main():
    args = get_args()
    # Multi-host bring-up first (single-host: silent no-op).
    from ..parallel import init_distributed

    init_distributed()

    from ..data import schema
    from ..eval.harness import EditorEvaluation
    from ..utils.registry import get_full_model_name, load_vllm_editor

    editor_name = args.editor_name.lower()
    full = get_full_model_name(args.edit_model_name)
    eval_name = args.data_name.upper()
    if args.eval_name_postfix:
        eval_name = "%s-%s" % (eval_name, args.eval_name_postfix)
    # Skip-if-evaluated: check the directory THIS run will write
    # (sequential_edit_<n>). The reference always tests single_edit
    # (test_vllm_edit.py:38-41) even before a sequential run — a quirk we
    # deliberately correct: a stale single_edit dir must not suppress a
    # sequential run, and re-runs of the same sequential_edit_n do skip.
    done = os.path.join(args.results_dir, editor_name, full, eval_name,
                        "sequential_edit_%s" % args.sequential_edit_n)
    if os.path.exists(done):
        print("Has evaluated: %s" % done)
        sys.exit()

    retriever, encoder = build_retriever(args)
    editor = load_vllm_editor(
        editor_name, full, weights_dir=args.weights_dir,
        configs_dir=args.configs_dir, ckpt_path=args.editor_ckpt_path,
        sentence_encoder=encoder, ike_store_path=args.store_path)
    data_cls = {"EVQA": schema.EVQA, "EIC": schema.EIC,
                "VLKEB": schema.VLKEB}[args.data_name]
    data_path = args.data_path or DEFAULT_DATA[args.data_name]
    data = data_cls(data_path, args.img_root_dir, retriever=retriever,
                    data_n=args.data_sample_n, encoder=encoder)
    if args.tensor_parallel > 1 or args.data_parallel:
        from ..parallel.mesh import make_mesh
        from ..parallel.sharding import shard_params

        mesh = make_mesh(dp=args.data_parallel, tp=args.tensor_parallel)
        editor.vllm.params = shard_params(editor.vllm.params, mesh)
        editor.vllm.mesh = mesh
        print("mesh:", dict(mesh.shape))
    # IKE/HICE are scored by the EasyEdit protocol's top-k agreement
    # by default (the reference's MultimodalEditor path).
    loc_topk = args.loc_topk
    if loc_topk is None and editor_name in ("ike", "hice"):
        loc_topk = 10
    if args.fused:
        from ..eval.harness import FusedEditorEvaluation

        ev = FusedEditorEvaluation(editor, data, eval_name, args.results_dir,
                                   max_rows=args.max_rows, pad_rows=True,
                                   hoist_pre=True, loc_topk=loc_topk)
    else:
        ev = EditorEvaluation(editor, data, eval_name, args.results_dir,
                              loc_topk=loc_topk)
    ev.evaluate_sequential_edit(args.sequential_edit_n, False, None)


if __name__ == "__main__":
    main()

"""External-benchmark CLI — the reference's mPLUG-Owl2 evaluate scripts.

    python -m devqa_tpu.cli.eval_benchmark -bm mme -bd <MME dir> \\
        -mn blip2 [-wd /path/to/converted-ckpt] [-ir <image root>]

The reference drives MME/MMBench/MMMU/VQA through per-benchmark torch
DataLoader scripts (``mPLUG_Owl2/mplug_owl2/evaluate/evaluate_mme.py``);
here one CLI feeds the benchmark's questions through the
continuous-batching serve engine and reproduces the reference's scoring
(see eval/benchmarks.py). MME, MMBench (annotation JSONL; prints dev
accuracy and writes the submission rows), VQA (test JSONL; VQAEval
protocol) and MMMU (flat JSONL stand-in for the HF parquet release;
per-subject acc + weighted Overall, evaluate_mmmu.py:506-530 as
executed) are implemented.
"""
from __future__ import annotations

import argparse
import json
import os


def get_args():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("-bm", "--benchmark", type=str, default="mme",
                   choices=["mme", "mmbench", "vqa", "mmmu"])
    p.add_argument("-bd", "--benchmark_dir", type=str, required=True,
                   help="MME: dir of <task>.txt files; MMBench: "
                        "annotation .jsonl; VQA: test .jsonl; "
                        "MMMU: items .jsonl, a .parquet file, or a "
                        "directory of the HF parquet release")
    p.add_argument("-mn", "--edit_model_name", type=str, required=True)
    p.add_argument("-wd", "--weights_dir", type=str, default=None)
    p.add_argument("-ir", "--img_root_dir", type=str, default="")
    p.add_argument("-mnt", "--max_new_tokens", type=int, default=10)
    p.add_argument("-ns", "--n_slots", type=int, default=8)
    p.add_argument("-ml", "--max_len", type=int, default=160)
    p.add_argument("-o", "--out_path", type=str, default=None)
    return p.parse_args()


def main():
    args = get_args()
    from ..eval import benchmarks as B
    from ..serve.engine import BatchingEngine
    from ..utils.registry import load_vllm_for_edit

    def load_mmmu_any(path):
        """JSONL stand-in, one parquet file, or a directory tree of the
        HF parquet release (one file per subject split). A directory
        holds dev/validation/test files side by side — mixing them
        would silently pool splits (and score test's masked answers as
        wrong), so prefer validation-* files when present, like the
        reference's default split (evaluate_mmmu.py args)."""
        if os.path.isdir(path):
            pq = sorted(
                os.path.join(r, f)
                for r, _, fs in os.walk(path)
                for f in fs if f.endswith(".parquet"))
            val = [p for p in pq
                   if os.path.basename(p).startswith("validation")]
            return B.load_mmmu_parquet(
                val or pq, image_dir=os.path.join(path, "_images"))
        if path.endswith(".parquet"):
            return B.load_mmmu_parquet(
                [path], image_dir=os.path.join(
                    os.path.dirname(path) or ".", "_images"))
        return B.load_mmmu_jsonl(path)

    loaders = {"mme": B.load_mme, "mmbench": B.load_mmbench,
               "vqa": B.load_vqa_jsonl, "mmmu": load_mmmu_any}
    runners = {"mme": B.run_mme, "mmbench": B.run_mmbench,
               "vqa": B.run_vqa, "mmmu": B.run_mmmu}
    scorers = {"mme": B.mme_scores, "mmbench": B.mmbench_results,
               "vqa": B.vqa_scores,
               "mmmu": lambda it: B.mmmu_scores(B.mmmu_outputs(it))}
    vllm = load_vllm_for_edit(args.edit_model_name,
                              weights_dir=args.weights_dir)
    items = loaders[args.benchmark](args.benchmark_dir)
    if not items:
        raise SystemExit("no benchmark items under %s" % args.benchmark_dir)
    engine = BatchingEngine(vllm, n_slots=args.n_slots,
                            max_len=args.max_len).start()
    try:
        runners[args.benchmark](engine, items,
                                max_new_tokens=args.max_new_tokens,
                                image_root=args.img_root_dir)
    finally:
        engine.shutdown()
    scores = scorers[args.benchmark](items)
    if args.benchmark == "mme":
        # per eval type: total, then ONLY that type's task rows (the
        # reference's process_result layout, evaluate_mme.py:106-166)
        for etype, total in scores["totals"].items():
            print("=========== %s: %.2f ===========" % (etype, total))
            for task in B.MME_EVAL_TYPES[etype]:
                m = scores["tasks"].get(task)
                if m is None:
                    continue
                print("\t%s score: %.2f (acc %.3f, acc+ %.3f)"
                      % (task, m["score"], m["acc"], m["acc_plus"]))
    elif args.benchmark == "mmbench":
        if "accuracy" in scores:
            print("MMBench dev accuracy: %.4f" % scores["accuracy"])
            for k, v in scores["per_l2_category"].items():
                print("\t%s: %.4f" % (k, v))
        else:
            print("MMBench test split: %d submission rows (no local "
                  "answers)" % len(scores["submission"]))
    elif args.benchmark == "mmmu":
        for k, v in scores["metrics"].items():
            print("\t%s: %.2f" % (k, v))
    else:
        print("VQA score: %.2f over %d questions"
              % (scores["overall"], scores["n"]))
        for k, v in scores.get("perAnswerType", {}).items():
            print("\t%s: %.2f" % (k, v))
    if args.out_path:
        with open(args.out_path, "w") as f:
            json.dump(scores, f, indent=1)
        print("saved:", args.out_path)


if __name__ == "__main__":
    main()

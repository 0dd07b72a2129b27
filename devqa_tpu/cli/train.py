"""Editor-training CLI — the reference's ``train_vllm_editor.py``.

    python -m devqa_tpu.cli.train -en liveedit -mn blip2 -dn EVQA \\
        -bs 4 -eps 10 [-ckpt path/to/Best] [-sd 42]
"""
from __future__ import annotations

import argparse


def get_args():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("-en", "--editor_name", type=str, required=True)
    p.add_argument("-mn", "--edit_model_name", type=str, required=True)
    p.add_argument("-dn", "--data_name", type=str, default="EVQA",
                   choices=["EVQA", "EIC", "VLKEB"])
    p.add_argument("-dp", "--data_path", type=str, default=None)
    p.add_argument("-ir", "--img_root_dir", type=str, default="data/images")
    p.add_argument("-dsn", "--data_sample_n", type=int, default=None)
    p.add_argument("-bs", "--batch_size", type=int, default=4)
    p.add_argument("-eps", "--epochs", type=int, default=10)
    p.add_argument("-ckpt", "--load_ckpt_path", type=str, default=None)
    p.add_argument("-tnp", "--train_name_prefix", type=str, default=None)
    p.add_argument("-sd", "--seed", type=int, default=None)
    p.add_argument("-ema", "--ema_alpha", type=float, default=0.1)
    p.add_argument("-sci", "--save_ckpt_per_i", type=int, default=200,
                   help="EMA-best checkpoint saves run at most once per "
                        "this many steps (pending bests flush at train "
                        "end); reference train_vllm_editor.py -sci")
    p.add_argument("-ms", "--max_steps", type=int, default=None,
                   help="stop after this many optimizer steps (bounds "
                        "wall-clock; a 'Best' checkpoint still flushes)")
    p.add_argument("-dbs", "--data_buffer_size", type=int, default=8)
    p.add_argument("-wd", "--weights_dir", type=str, default=None)
    p.add_argument("-cfgs", "--configs_dir", type=str, default="configs")
    p.add_argument("-rec", "--records_dir", type=str, default="records")
    p.add_argument("-aug", "--augment", action="store_true",
                   help="BLIP train-processor augmentation (RandomResized"
                        "Crop + flip + RandAugment N=2 M=5), refreshed "
                        "per epoch")
    p.add_argument("-vdp", "--val_data_path", type=str, default=None,
                   help="validation dataset JSON -> periodic validation "
                        "with best-val checkpointing (BaseTrainer.py:148)")
    p.add_argument("-vi", "--val_interval", type=int, default=100)
    p.add_argument("-vs", "--val_steps", type=int, default=None)
    p.add_argument("-esp", "--early_stop_patience", type=int, default=None)
    p.add_argument("-esk", "--early_stop_key", type=str, default="loss")
    p.add_argument("-rt", "--retrieval", type=str, default="hash",
                   choices=["hash", "minilm"])
    p.add_argument("-red", "--retrieval_encoder_dir", type=str, default=None)
    p.add_argument("-st", "--store_path", type=str, default=None)
    return p.parse_args()


def main():
    args = get_args()
    import time

    # Multi-host bring-up must precede any backend-touching jax call
    # (no-op on single-host launches; replaces the reference's
    # init_distributed_mode, dist_utils.py:56).
    from ..parallel import init_distributed

    init_distributed()

    from ..data import schema
    from ..train.loop import EditorTrainer
    from ..utils.registry import get_full_model_name, load_vllm_editor
    from .evaluate import DEFAULT_DATA, build_retriever

    full = get_full_model_name(args.edit_model_name)
    retriever, encoder = build_retriever(args)
    editor = load_vllm_editor(
        args.editor_name.lower(), full, weights_dir=args.weights_dir,
        configs_dir=args.configs_dir, sentence_encoder=encoder)
    if args.augment:
        from ..data.augment import AugmentingImageProvider

        vllm = editor.vllm
        vllm.image_provider = AugmentingImageProvider(
            vllm.image_provider, vllm.cfg.vit.image_size,
            seed=args.seed or 0)
    data_cls = {"EVQA": schema.EVQA, "EIC": schema.EIC,
                "VLKEB": schema.VLKEB}[args.data_name]
    data_path = args.data_path or DEFAULT_DATA[args.data_name].replace(
        "eval", "train")
    data = data_cls(data_path, args.img_root_dir, retriever=retriever,
                    data_n=args.data_sample_n, encoder=encoder)
    val_data = None
    if args.val_data_path:
        val_data = data_cls(args.val_data_path, args.img_root_dir,
                            retriever=retriever, encoder=encoder)
    name = (args.train_name_prefix + "-" if args.train_name_prefix else "") \
        + args.data_name + "-" + time.strftime("%Y.%m.%d-%H.%M.%S")
    trainer = EditorTrainer(
        editor, data, args.batch_size, records_dir=args.records_dir,
        train_name=name, load_ckpt_path=args.load_ckpt_path,
        ema_alpha=args.ema_alpha, random_seed=args.seed,
        data_buffer_size=args.data_buffer_size,
        val_data=val_data, val_interval=args.val_interval,
        val_steps=args.val_steps,
        early_stop_patience=args.early_stop_patience,
        early_stop_key=args.early_stop_key,
        save_ckpt_per_i=args.save_ckpt_per_i)
    trainer.train(args.epochs, max_steps=args.max_steps)


if __name__ == "__main__":
    main()

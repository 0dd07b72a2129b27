"""Build retrieval embedding stores — the reference's store-construction
step (``encode_ike_facts_multimodal``, ike/util.py:54-86, and the
vlkeb/vqa probe stores of dataset/vllm.py:89-117).

    python -m devqa_tpu.cli.build_store --data data/vqa_train.json \\
        --img-root data/images --out stores/vqa_probe_store.pkl \\
        [--kind probe|ike] [--encoder-dir /path/to/minilm]
"""
from __future__ import annotations

import argparse
import json


def main():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--data", required=True)
    p.add_argument("--img-root", default="")
    p.add_argument("--out", required=True)
    p.add_argument("--kind", choices=["probe", "ike"], default="probe")
    p.add_argument("--encoder-dir", default=None,
                   help="local sentence-transformer dir (hash encoder if absent)")
    p.add_argument("--size", type=int, default=None)
    args = p.parse_args()

    if args.encoder_dir:
        from ..retrieval.encoders import MiniLMEncoder

        encoder = MiniLMEncoder.from_hf_dir(args.encoder_dir)
    else:
        from ..retrieval.store import hash_encoder

        encoder = hash_encoder(384)

    with open(args.data) as f:
        records = json.load(f)
    if args.size:
        records = records[: args.size]

    if args.kind == "ike":
        from ..editors.ike import encode_ike_facts

        store = encode_ike_facts(records, encoder, args.img_root)
    else:
        from ..data.schema import build_dataset_retriever

        store = build_dataset_retriever(records, args.img_root, encoder).store
    store.save(args.out)
    print("saved %d entries to %s" % (len(store), args.out))


if __name__ == "__main__":
    main()

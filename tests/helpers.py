"""Shared test fixtures: tiny models, synthetic datasets."""
import json
import os
import subprocess
import sys

import jax
import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def isolate_in_subprocess(test_id: str) -> bool:
    """Run ``test_id`` via a fresh pytest subprocess and return True —
    unless we ARE that subprocess (returns False → caller runs inline).

    Multi-device GSPMD programs on the virtual CPU mesh leave XLA's CPU
    backend in a state where a LATER compile in the same long-lived
    process can segfault (upstream bug; reproduced across 4 full-suite
    runs, always after the mesh tests). Subprocess isolation contains
    both the mesh state and any crash."""
    # Distinct marker from the conftest orchestrator's per-FILE
    # subprocess flag: under `pytest tests/` every file already runs
    # with DEVQA_IN_SUBPROC=1, and keying on it ran this test INLINE in
    # a process whose jax backend was already initialized by earlier
    # tests in the file (jax.distributed.initialize then raises).
    if os.environ.get("DEVQA_ISOLATED") == "1":
        return False
    env = {**os.environ, "DEVQA_ISOLATED": "1", "DEVQA_IN_SUBPROC": "1"}
    r = subprocess.run([sys.executable, "-m", "pytest", test_id, "-q",
                        "--no-header", "-p", "no:cacheprovider"],
                       env=env, cwd=REPO)
    assert r.returncode == 0, "%s failed in subprocess (rc=%d)" % (
        test_id, r.returncode)
    return True

from devqa_tpu.core import vllm as vllm_mod
from devqa_tpu.core.tokenizer import ToyTokenizer
from devqa_tpu.core.wrapper import JaxVLLM
from devqa_tpu.data.images import SyntheticImageProvider


def make_tiny_vllm(arch="opt", seed=0, img_slot_pos=0, bucket_multiple=8):
    cfg = vllm_mod.tiny_vllm_config(arch, img_slot_pos=img_slot_pos)
    params = vllm_mod.init_vllm_params(cfg, jax.random.PRNGKey(seed))
    tok = ToyTokenizer(vocab_size=cfg.decoder.vocab_size)
    provider = SyntheticImageProvider(cfg.vit.image_size)
    return JaxVLLM(cfg, params, tok, provider, bucket_multiple=bucket_multiple)


def synth_records(n, seed=0):
    """EVQA/VLKEB-schema records with synthetic image 'paths'."""
    rng = np.random.default_rng(seed)
    words = ["cat", "dog", "sky", "tree", "car", "house", "red", "blue",
             "bird", "fish", "sun", "moon", "road", "book", "cup", "hat"]

    def phrase(k):
        return " ".join(rng.choice(words, size=k))

    records = []
    for i in range(n):
        records.append({
            "src": "what is the %s near the %s" % (phrase(1), phrase(1)),
            "rephrase": "which %s is near the %s" % (phrase(1), phrase(1)),
            "pred": phrase(1),
            "alt": phrase(1),
            "image": "img_%d.jpg" % i,
            "image_rephrase": "img_%d_re.jpg" % i,
            "loc": "who wrote the %s about the %s" % (phrase(1), phrase(1)),
            "loc_ans": phrase(1),
            "m_loc": "mloc_%d.jpg" % i,
            "m_loc_q": "what color is the %s" % phrase(1),
            "m_loc_a": phrase(1),
        })
    return records


def write_records(tmpdir, n, seed=0, name="vqa_eval.json"):
    records = synth_records(n, seed)
    path = os.path.join(tmpdir, name)
    with open(path, "w") as f:
        json.dump(records, f)
    return path, records

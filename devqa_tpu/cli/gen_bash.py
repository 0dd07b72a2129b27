"""Sweep-script generator — the reference's ``gen_bash.py``: emit per-host
bash files sweeping trained checkpoints × editors × datasets.
"""
from __future__ import annotations

import argparse
import os


def main():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--records_dir", default="records")
    p.add_argument("--hosts", type=int, default=4)
    p.add_argument("--dsn", type=int, default=500)
    args = p.parse_args()

    ckpts = []
    for i, dirs, files in os.walk(args.records_dir):
        # Orbax 'Best' checkpoints are DIRECTORIES (train/loop.save_ckpt);
        # file names are also scanned for torch-style single-file ckpts.
        for d in dirs:
            if d.endswith("Best"):
                ckpts.append(os.path.join(i, d))
        for kk in files:
            if kk.endswith("Best"):
                ckpts.append(os.path.join(i, kk))
    # os.walk descends INTO Best dirs; don't also pick up nested matches
    ckpts = [c for c in ckpts
             if not os.path.dirname(c).endswith("Best")]
    buckets = [[] for _ in range(args.hosts)]
    for n, m in enumerate(sorted(ckpts)):
        parts = m.split(os.sep)
        editor, model = parts[-5], parts[-4]
        dt = "VLKEB" if "VLKEB" in m else "EVQA"
        cmd = ("python -m devqa_tpu.cli.evaluate -en %s -mn %s -sen 1 "
               "-ckpt %s -dn %s -dsn %d" % (editor, model, m, dt, args.dsn))
        buckets[n % args.hosts].append(cmd)
    # training-free editors
    n = 0
    for ed in ("lemoe_vl", "tp_vl", "ft_vl"):
        for md in ("blip2", "llava", "minigpt4"):
            for dt in ("VLKEB", "EVQA"):
                cmd = ("python -m devqa_tpu.cli.evaluate -en %s -mn %s "
                       "-sen 1 -dn %s -dsn %d" % (ed, md, dt, args.dsn))
                buckets[n % args.hosts].append(cmd)
                n += 1
    for i, cmds in enumerate(buckets):
        with open("bash%d.sh" % i, "w") as f:
            f.write("#!/bin/bash\n" + "\n".join(cmds) + "\n")
        print("wrote bash%d.sh (%d commands)" % (i, len(cmds)))


if __name__ == "__main__":
    main()

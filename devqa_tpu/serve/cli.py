"""Interactive chat CLI against a worker/controller — the reference's
``mPLUG_Owl2/serve/cli.py`` role.

    python -m devqa_tpu.serve.cli --url http://127.0.0.1:21001 \\
        [--image path.jpg]

Commands: plain text chats; ``/edit <prompt> => <target>`` applies a
knowledge edit; ``/restore`` resets; ``/image <path>`` switches the image.
"""
from __future__ import annotations

import argparse
import json
import sys
import urllib.request


def post(url: str, path: str, body: dict) -> dict:
    req = urllib.request.Request(
        url.rstrip("/") + path, data=json.dumps(body).encode(),
        headers={"Content-Type": "application/json"})
    with urllib.request.urlopen(req, timeout=600) as r:
        return json.loads(r.read())


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--url", default="http://127.0.0.1:21001")
    p.add_argument("--image", default=None)
    p.add_argument("--max-new-tokens", type=int, default=16)
    p.add_argument("--template", default="none",
                   help="conversation template (serve/templates.py): "
                        "none|v0|minigpt4|v1|mplug_owl2")
    args = p.parse_args(argv)
    from .templates import CONV_TEMPLATES

    conv = CONV_TEMPLATES[args.template]
    image = args.image
    print("devqa_tpu chat — /edit <prompt> => <target>, /restore, "
          "/image <path>, /quit")
    for line in sys.stdin:
        line = line.strip()
        if not line:
            continue
        if line in ("/quit", "/exit"):
            break
        if line.startswith("/image "):
            image = line[len("/image "):].strip() or None
            print("[image: %s]" % image)
            continue
        if line == "/restore":
            print(post(args.url, "/restore", {}))
            continue
        if line.startswith("/edit "):
            body = line[len("/edit "):]
            if "=>" not in body:
                print("usage: /edit <prompt> => <target>")
                continue
            prompt, target = (x.strip() for x in body.split("=>", 1))
            print(post(args.url, "/edit",
                       {"prompt": prompt, "target_new": target,
                        "image": image}))
            continue
        prompt = conv.wrap(line) if conv is not None else line
        out = post(args.url, "/generate",
                   {"prompt": prompt, "image": image,
                    "max_new_tokens": args.max_new_tokens})
        print(out.get("text", out))


if __name__ == "__main__":
    main()

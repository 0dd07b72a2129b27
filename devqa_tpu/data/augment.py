"""Train-time image augmentation — the reference's BLIP train processor
(``easyeditor/dataset/processor/blip_processors.py:25-60``
``BlipImageTrainProcessor``: RandomResizedCrop(scale 0.5-1.0, bicubic) →
RandomHorizontalFlip → RandomAugment(N=2, M=5, 10-op list) — and the
vendored ``randaugment.py`` op/magnitude tables :223-325).

Host-side (numpy + PIL), running in the prefetch thread like every other
decode step; the device graph stays fixed-shape (augmentation changes
pixels, never shapes). Two deliberate differences from the reference:

- ops are PIL-backed instead of cv2 (not in this image); affine ops
  invert the reference's forward cv2 matrices so the geometry matches
  (shear/translate sign conventions preserved).
- randomness is a per-(seed, epoch, path) ``np.random.Generator`` rather
  than the global ``np.random`` stream, so augmentation is reproducible
  and does not perturb other seeded components.

``AugmentingImageProvider`` wraps any provider; ``EditorTrainer`` calls
``reseed(epoch)`` and clears the vision cache each epoch (the torch
DataLoader re-processes images every epoch — same freshness).
"""
from __future__ import annotations

import zlib
from typing import Optional, Sequence, Tuple

import numpy as np

MAX_LEVEL = 10          # randaugment.py:320
TRANSLATE_CONST = 10    # randaugment.py:319
FILL = (128, 128, 128)  # randaugment.py:321 replace_value

# the train processor's op list (blip_processors.py:40-55)
TRAIN_AUGS = ("Identity", "AutoContrast", "Brightness", "Sharpness",
              "Equalize", "ShearX", "ShearY", "TranslateX", "TranslateY",
              "Rotate")


def _to_pil(img: np.ndarray):
    from PIL import Image

    return Image.fromarray(np.asarray(img, np.uint8))


def _apply_op(img: np.ndarray, name: str, level: float,
              rng: np.random.Generator) -> np.ndarray:
    """One RandAugment op at ``level`` (magnitude M). Arg mappings follow
    randaugment.py:223-282; sign flips use the provided rng."""
    from PIL import Image, ImageEnhance, ImageOps

    if name == "Identity":
        return img
    pil = _to_pil(img)
    if name == "AutoContrast":        # cutoff=0 (:19-49)
        out = ImageOps.autocontrast(pil)
    elif name == "Equalize":          # (:52-73)
        out = ImageOps.equalize(pil)
    elif name in ("Brightness", "Sharpness", "Color", "Contrast"):
        factor = (level / MAX_LEVEL) * 1.8 + 0.1   # enhance_level (:224-227)
        out = getattr(ImageEnhance, name)(pil).enhance(factor)
    elif name in ("ShearX", "ShearY"):
        f = (level / MAX_LEVEL) * 0.3              # shear_level (:230-236)
        if rng.random() > 0.5:
            f = -f
        # cv2 forward [[1,f],[0,1]] → PIL inverse map (1,-f) (:159-166)
        data = (1, -f, 0, 0, 1, 0) if name == "ShearX" else \
            (1, 0, 0, -f, 1, 0)
        out = pil.transform(pil.size, Image.AFFINE, data,
                            resample=Image.BILINEAR, fillcolor=FILL)
    elif name in ("TranslateX", "TranslateY"):
        off = (level / MAX_LEVEL) * TRANSLATE_CONST  # (:240-247)
        if rng.random() > 0.5:
            off = -off
        # cv2 M=[[1,0,-off],[0,1,0]] (:168-189) → PIL inverse (+off)
        data = (1, 0, off, 0, 1, 0) if name == "TranslateX" else \
            (1, 0, 0, 0, 1, off)
        out = pil.transform(pil.size, Image.AFFINE, data,
                            resample=Image.BILINEAR, fillcolor=FILL)
    elif name == "Rotate":
        deg = (level / MAX_LEVEL) * 30               # (:290-296)
        if rng.random() < 0.5:
            deg = -deg
        out = pil.rotate(deg, resample=Image.BILINEAR, fillcolor=FILL)
    elif name == "Solarize":
        out = ImageOps.solarize(pil, int((level / MAX_LEVEL) * 256))
    elif name == "Posterize":
        out = ImageOps.posterize(pil, max(1, int((level / MAX_LEVEL) * 4)))
    else:
        raise ValueError("unknown augment op: %r" % name)
    return np.asarray(out, np.uint8)


def rand_augment(img: np.ndarray, rng: np.random.Generator,
                 n: int = 2, m: float = 5,
                 augs: Sequence[str] = TRAIN_AUGS) -> np.ndarray:
    """RandomAugment(N, M) (randaugment.py:326-349): sample N ops, apply
    each with probability 0.5 at fixed magnitude M."""
    for name in rng.choice(np.asarray(augs, object), n):
        if rng.random() > 0.5:
            continue
        img = _apply_op(img, str(name), m, rng)
    return img


def random_resized_crop(img: np.ndarray, out_size: int,
                        rng: np.random.Generator,
                        scale: Tuple[float, float] = (0.5, 1.0),
                        ratio: Tuple[float, float] = (3 / 4, 4 / 3)) -> np.ndarray:
    """torchvision RandomResizedCrop semantics (blip_processors.py:34-38):
    sample an area fraction and log-uniform aspect ratio (10 attempts,
    center-crop fallback), crop, bicubic-resize to out_size."""
    from PIL import Image

    h, w = img.shape[:2]
    area = h * w
    for _ in range(10):
        target = area * rng.uniform(*scale)
        ar = float(np.exp(rng.uniform(np.log(ratio[0]), np.log(ratio[1]))))
        cw = int(round(np.sqrt(target * ar)))
        ch = int(round(np.sqrt(target / ar)))
        if 0 < cw <= w and 0 < ch <= h:
            x = int(rng.integers(0, w - cw + 1))
            y = int(rng.integers(0, h - ch + 1))
            crop = img[y:y + ch, x:x + cw]
            break
    else:  # fallback: center crop at the clamped aspect
        side = min(h, w)
        y, x = (h - side) // 2, (w - side) // 2
        crop = img[y:y + side, x:x + side]
    pil = _to_pil(crop).resize((out_size, out_size), Image.BICUBIC)
    return np.asarray(pil, np.uint8)


def blip_train_transform(img: np.ndarray, out_size: int,
                         rng: np.random.Generator,
                         min_scale: float = 0.5, max_scale: float = 1.0,
                         n: int = 2, m: float = 5) -> np.ndarray:
    """The full BlipImageTrainProcessor pixel pipeline (normalization
    stays on-device in core/preprocess.py, as for eval)."""
    img = random_resized_crop(img, out_size, rng, (min_scale, max_scale))
    if rng.random() < 0.5:
        img = img[:, ::-1]  # RandomHorizontalFlip
    return rand_augment(img, rng, n=n, m=m)


class AugmentingImageProvider:
    """Wraps any ImageProvider with the train transform.

    Deterministic per (seed, epoch, path): the same epoch re-reads a path
    identically (vision-cache coherent within an epoch), while
    ``reseed(epoch)`` — called by EditorTrainer at each epoch together
    with a vision-cache clear — refreshes every augmentation (the torch
    DataLoader's per-epoch re-processing)."""

    def __init__(self, base, image_size: int, seed: int = 0,
                 min_scale: float = 0.5, max_scale: float = 1.0,
                 n: int = 2, m: float = 5):
        self.base = base
        self.image_size = image_size
        self.seed = seed
        self.epoch = 0
        self.min_scale, self.max_scale = min_scale, max_scale
        self.n, self.m = n, m

    def reseed(self, epoch: int) -> None:
        self.epoch = int(epoch)

    def __call__(self, path: str) -> np.ndarray:
        rng = np.random.default_rng(
            (self.seed * 1000003 + self.epoch * 101
             + zlib.crc32(str(path).encode())) % (2 ** 63))
        # Crop the ORIGINAL image when the base can decode one (the
        # reference's RandomResizedCrop runs before any resize); falling
        # back to the transport-resolution image only for providers with
        # no raw decode (synthetic).
        raw = getattr(self.base, "load_raw", None)
        img = raw(path) if raw is not None else self.base(path)
        return blip_train_transform(
            img, self.image_size, rng,
            self.min_scale, self.max_scale, self.n, self.m)

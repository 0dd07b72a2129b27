"""Image providers: path → raw uint8 array.

The reference decodes PIL images inline in its wrappers
(``blip2.py:56-58``). We separate decode (host) from preprocessing
(device, core/preprocess.py): providers return uint8 [S, S, 3] at the
model's input resolution so batches are fixed-shape and the
normalize/patchify stays inside the jitted graph.
"""
from __future__ import annotations

import zlib
from typing import Optional, Protocol

import numpy as np


class ImageProvider(Protocol):
    def __call__(self, path: str) -> np.ndarray:  # [S, S, 3] uint8
        ...


class FileImageProvider:
    """PIL-backed decode + host-side resize to the transport resolution."""

    def __init__(self, image_size: int):
        self.image_size = image_size

    def __call__(self, path: str) -> np.ndarray:
        from PIL import Image

        with Image.open(path) as img:
            img = img.convert("RGB").resize(
                (self.image_size, self.image_size), Image.BICUBIC)
            return np.asarray(img, dtype=np.uint8)

    def load_raw(self, path: str) -> np.ndarray:
        """Original-resolution decode — the train augmentation pipeline
        crops BEFORE resizing (BlipImageTrainProcessor order); cropping
        an already-downsampled square would blur and distort geometry."""
        from PIL import Image

        with Image.open(path) as img:
            return np.asarray(img.convert("RGB"), dtype=np.uint8)


class SyntheticImageProvider:
    """Deterministic path-seeded random images — for tests and benches
    where no real image corpus exists."""

    def __init__(self, image_size: int):
        self.image_size = image_size

    def __call__(self, path: str) -> np.ndarray:
        seed = zlib.crc32(str(path).encode()) % (2 ** 31)
        rng = np.random.default_rng(seed)
        return rng.integers(0, 256, (self.image_size, self.image_size, 3),
                            dtype=np.uint8).astype(np.uint8)

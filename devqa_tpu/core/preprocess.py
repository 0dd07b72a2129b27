"""Image preprocessing, jitted into the model graph.

The reference preprocesses on host CPU (PIL + torchvision-style processors,
e.g. ``BlipImageEvalProcessor`` resize+normalize,
``easyeditor/dataset/processor/blip_processors.py:130-148``) and ships
float tensors to the GPU. TPU-native: ship raw uint8 images once and run
resize/normalize/patchify on-device inside the same XLA program as the
vision tower (BASELINE.json requirement).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

# OpenAI-CLIP normalization constants used by the BLIP-2 / CLIP / LAVIS
# processors the reference loads.
CLIP_MEAN = (0.48145466, 0.4578275, 0.40821073)
CLIP_STD = (0.26862954, 0.26130258, 0.27577711)


def preprocess_images(
    images_u8: jnp.ndarray,
    image_size: int,
    mean=CLIP_MEAN,
    std=CLIP_STD,
) -> jnp.ndarray:
    """[B, H, W, 3] uint8 → [B, image_size, image_size, 3] normalized f32.

    Bicubic resize matches PIL/torchvision BICUBIC used by the reference
    processors closely enough for metric parity (images are photographs,
    not adversarial signals).
    """
    x = images_u8.astype(jnp.float32) / 255.0
    b = x.shape[0]
    if x.shape[1:3] != (image_size, image_size):
        # Skip the no-op resize: XLA still materializes the full
        # separable-cubic gather for same-size inputs (providers usually
        # decode at the model size already).
        x = jax.image.resize(x, (b, image_size, image_size, 3),
                             method="cubic")
    mean = jnp.asarray(mean, jnp.float32)
    std = jnp.asarray(std, jnp.float32)
    return (x - mean) / std

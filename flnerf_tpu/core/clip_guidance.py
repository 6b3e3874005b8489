"""CLIP guidance loss for text-conditioned NeRF (rand_pose training).

Parity target: ngp-ours/nerf/clip_utils.py CLIPLoss — negative cosine
similarity between CLIP image embeddings of rendered views and text
embeddings (dreamfields-style).

Gated like LPIPS (core/metrics.py): the CLIP weights cannot be downloaded
offline, so `clip_loss_fn` returns None unless a local encoder is
available — the loss STRUCTURE (resize + CLIP normalization + cosine
similarity, random text pick) is implemented here against any encoder
with the (images [N,3,224,224] -> [N, D]) contract, and unit-tested with
a stub encoder.
"""

from __future__ import annotations

from typing import Callable, Optional, Sequence

import numpy as np

# CLIP's published preprocessing constants
_CLIP_MEAN = np.array([0.48145466, 0.4578275, 0.40821073], np.float32)
_CLIP_STD = np.array([0.26862954, 0.26130258, 0.27577711], np.float32)


def clip_preprocess(images):
    """[N, H, W, 3] in [0,1] -> [N, 3, 224, 224] CLIP-normalized (the
    reference's T.Resize(224) + T.Normalize)."""
    import jax.image
    import jax.numpy as jnp

    n = images.shape[0]
    resized = jax.image.resize(images, (n, 224, 224, 3), "bilinear")
    normed = (resized - _CLIP_MEAN) / _CLIP_STD
    return jnp.transpose(normed, (0, 3, 1, 2))


def _normalize(z):
    import jax.numpy as jnp

    return z / jnp.linalg.norm(z, axis=-1, keepdims=True)


class CLIPGuidance:
    """Text-guided loss: -cos(encode(render), encode(text)).

    ``image_encoder(images [N,3,224,224]) -> [N, D]`` and
    ``text_zs [T, D]`` are injected, so the structure works with any CLIP
    implementation (or the test stub)."""

    def __init__(self, image_encoder: Callable, text_zs):
        self.image_encoder = image_encoder
        self.text_zs = _normalize(text_zs)

    def __call__(self, images, key=None):
        import jax
        import jax.numpy as jnp

        zs = _normalize(self.image_encoder(clip_preprocess(images)))
        t = self.text_zs
        if t.shape[0] > 1:
            # reference picks one prompt at random per step
            idx = (
                jax.random.randint(key, (), 0, t.shape[0])
                if key is not None else 0
            )
            t = jax.lax.dynamic_slice_in_dim(t, idx, 1, 0)
        return -jnp.mean(jnp.sum(zs * t, -1))


def clip_loss_fn(texts: Sequence[str], name: str = "ViT-B/16"
                 ) -> Optional[CLIPGuidance]:
    """Build the guidance from the real CLIP if importable + weights cached
    locally; None otherwise (offline gate, like metrics.lpips_fn)."""
    try:
        import clip  # type: ignore
        import torch  # noqa: F401
    except Exception:
        return None
    try:
        model, _ = clip.load(name, device="cpu", jit=False)
    except Exception:
        return None

    import torch

    model.eval()
    with torch.no_grad():
        text_zs = model.encode_text(clip.tokenize(list(texts))).numpy()

    def encode(images):
        import jax

        def host_encode(x):
            with torch.no_grad():
                return model.encode_image(torch.from_numpy(np.asarray(x))
                                          ).numpy().astype(np.float32)

        import jax.numpy as jnp

        return jax.pure_callback(
            host_encode,
            jax.ShapeDtypeStruct((images.shape[0], text_zs.shape[-1]),
                                 jnp.float32),
            images,
        )

    import jax.numpy as jnp

    return CLIPGuidance(encode, jnp.asarray(text_zs, jnp.float32))

"""On-device perspective warping (the BASELINE.json "on-device warp
augmentation" goal: replaces `cv2.warpPerspective` in the synthetic
homography data path, reference `datasets/homographies.py:41`).

Inverse-mapping bilinear warp in pure jnp — the homography-pair generator can
then run entirely inside the jitted train step: the host only streams source
images; crops, warps, and photometric jitter happen on device.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from .grid_sample import grid_sample_nd


def warp_perspective(
    image: jnp.ndarray, H: jnp.ndarray, out_size: tuple[int, int]
) -> jnp.ndarray:
    """Warp (B, Hin, Win, C) images by homographies H (B, 3, 3) mapping
    SOURCE -> TARGET pixel coords (cv2.warpPerspective convention): the output
    pixel p_t samples the source at H^-1 p_t. out_size = (width, height)."""
    B = image.shape[0]
    W, Hh = int(out_size[0]), int(out_size[1])
    xs = jnp.arange(W, dtype=jnp.float32) + 0.5
    ys = jnp.arange(Hh, dtype=jnp.float32) + 0.5
    xx, yy = jnp.meshgrid(xs, ys, indexing="xy")
    grid = jnp.stack([xx.ravel(), yy.ravel(), jnp.ones(W * Hh)], axis=0)  # (3, P)
    Hinv = jnp.linalg.inv(H)
    src = jnp.einsum("bij,jp->bip", Hinv, grid)
    src = src[:, :2] / (src[:, 2:3] + 1e-12)  # (B, 2, P)
    pts = src.transpose(0, 2, 1)  # (B, P, 2) in source pixel coords
    out = grid_sample_nd(image, pts)
    return out.reshape(B, Hh, W, image.shape[-1])


def photometric_jitter(image: jnp.ndarray, rng, strength: float = 0.5) -> jnp.ndarray:
    """Stateless on-device photometric augmentation: brightness/contrast/
    gamma/noise (the device-side counterpart of `data/augmentations.py`)."""
    k1, k2, k3, k4 = jax.random.split(rng, 4)
    B = image.shape[0]
    brightness = 1.0 + strength * jax.random.uniform(k1, (B, 1, 1, 1), minval=-0.3, maxval=0.3)
    contrast = 1.0 + strength * jax.random.uniform(k2, (B, 1, 1, 1), minval=-0.3, maxval=0.3)
    gamma = 1.0 + strength * jax.random.uniform(k3, (B, 1, 1, 1), minval=-0.4, maxval=0.6)
    mean = image.mean(axis=(1, 2, 3), keepdims=True)
    out = (image - mean) * contrast + mean * brightness
    out = jnp.clip(out, 0.0, 1.0) ** gamma
    noise = strength * 0.02 * jax.random.normal(k4, image.shape)
    return jnp.clip(out + noise, 0.0, 1.0)

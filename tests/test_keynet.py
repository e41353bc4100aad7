"""Native KeyNet+HardNet extractor: shapes, masks, rotation behavior."""

import jax
import jax.numpy as jnp
import numpy as np

from gluefactory_tpu.models import get_model


def _img(seed=0, h=96, w=128):
    rng = np.random.default_rng(seed)
    import cv2

    x = rng.uniform(0, 1, (h // 8, w // 8)).astype(np.float32)
    x = cv2.resize(x, (w, h), interpolation=cv2.INTER_CUBIC)
    return jnp.asarray(np.clip(x, 0, 1)[None, :, :, None])


def test_keynet_forward_contract():
    model = get_model("keynet_affnet_hardnet").from_conf(
        {"max_num_keypoints": 64, "force_num_keypoints": True}
    )
    img = _img()
    v = model.init(
        {"params": jax.random.key(0), "sample": jax.random.key(1)},
        {"image": img},
    )
    out = model.apply(v, {"image": img}, rngs={"sample": jax.random.key(2)})
    assert out["keypoints"].shape == (1, 64, 2)
    assert out["descriptors"].shape == (1, 64, 128)
    assert out["oris"].shape == (1, 64)
    assert bool(out["keypoint_mask"].all())
    n = np.linalg.norm(np.asarray(out["descriptors"][0]), axis=-1)
    np.testing.assert_allclose(n, 1.0, atol=1e-3)


def test_hardnet_descriptor_rotation_covariance():
    """With the dominant-orientation normalization, descriptors of a patch
    and its 90-degree-rotated copy should be close (same canonical frame)."""
    from gluefactory_tpu.models.extractors.keynet_affnet_hardnet import (
        HardNet,
        dominant_orientation,
        extract_patches,
    )

    rng = np.random.default_rng(3)
    import cv2

    base = rng.uniform(0, 1, (16, 16)).astype(np.float32)
    img = cv2.resize(base, (128, 128), interpolation=cv2.INTER_CUBIC)
    img_r = np.rot90(img).copy()

    hn = HardNet()
    pv = hn.init(jax.random.key(0), jnp.zeros((1, 32, 32, 1)))

    def desc_at(image, x, y):
        kp = jnp.asarray([[x, y]], jnp.float32)
        sc = jnp.asarray([10.0])
        up = extract_patches(jnp.asarray(image), kp, sc, jnp.zeros(1), 32)
        th = dominant_orientation(up)
        p = extract_patches(jnp.asarray(image), kp, sc, th, 32)
        p = (p - p.mean()) / (p.std() + 1e-6)
        return np.asarray(hn.apply(pv, p[..., None]))[0]

    # center point maps to itself under rot90
    d0 = desc_at(img, 64.0, 64.0)
    d1 = desc_at(img_r, 64.0, 64.0)
    cos = float((d0 * d1).sum())
    assert cos > 0.7, cos

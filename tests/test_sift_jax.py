"""Tests for the TPU-native DoG SIFT (ops/sift_jax.py): static shapes,
agreement with OpenCV's SIFT on a textured image, and model wiring."""

import pytest
import cv2
import jax
import jax.numpy as jnp
import numpy as np

from gluefactory_tpu.ops.sift_jax import sift_detect


def make_texture(h=240, w=320, seed=0):
    rng = np.random.default_rng(seed)
    img = rng.uniform(0, 1, (h // 8, w // 8)).astype(np.float32)
    img = cv2.resize(img, (w, h), interpolation=cv2.INTER_CUBIC)
    img = cv2.GaussianBlur(img, (0, 0), 1.0)
    return np.clip(img, 0, 1)


@pytest.mark.slow
def test_sift_jax_shapes_and_masks():
    img = jnp.asarray(make_texture()[None])
    out = sift_detect(img, 128)
    assert out["keypoints"].shape == (1, 128, 2)
    assert out["descriptors"].shape == (1, 128, 128)
    assert out["keypoint_mask"].shape == (1, 128)
    assert bool(out["keypoint_mask"].any())
    # valid descriptors are unit-normalized
    m = np.asarray(out["keypoint_mask"][0])
    n = np.linalg.norm(np.asarray(out["descriptors"][0])[m], axis=-1)
    np.testing.assert_allclose(n, 1.0, atol=1e-3)
    # keypoints inside the image
    k = np.asarray(out["keypoints"][0])[m]
    assert (k[:, 0] >= 0).all() and (k[:, 0] <= 320).all()
    assert (k[:, 1] >= 0).all() and (k[:, 1] <= 240).all()


def test_sift_jax_agrees_with_opencv():
    """The native DoG pipeline should fire on (mostly) the same structures
    as cv2.SIFT: >= half of cv2's strongest keypoints have a native
    detection within 3 px."""
    tex = make_texture(seed=1)
    out = sift_detect(jnp.asarray(tex[None]), 256)
    m = np.asarray(out["keypoint_mask"][0])
    kj = np.asarray(out["keypoints"][0])[m]

    sift = cv2.SIFT_create(contrastThreshold=0.04)
    kps = sift.detect((tex * 255).astype(np.uint8), None)
    kps = sorted(kps, key=lambda k: -k.response)[:50]
    kc = np.array([k.pt for k in kps], np.float32)
    if len(kc) == 0:
        return  # texture too smooth for cv2 at this threshold
    d = np.linalg.norm(kc[:, None, :] - kj[None, :, :], axis=-1).min(axis=1)
    assert (d < 3.0).mean() >= 0.5, (d < 3.0).mean()


@pytest.mark.slow
def test_sift_model_jax_backend():
    from gluefactory_tpu.models import get_model

    img = jnp.asarray(make_texture(seed=2)[None, :, :, None])
    model = get_model("sift").from_conf(
        {"backend": "jax", "max_num_keypoints": 64,
         "force_num_keypoints": True}
    )
    variables = model.init(
        {"params": jax.random.key(0), "sample": jax.random.key(1)},
        {"image": img},
    )
    out = model.apply(variables, {"image": img},
                      rngs={"sample": jax.random.key(2)})
    assert out["keypoints"].shape == (1, 64, 2)
    assert out["scales"].shape == (1, 64)
    assert out["oris"].shape == (1, 64)
    assert bool(out["keypoint_mask"].all())  # force_num_keypoints
    # rootsift: descriptors L2-normalized after sqrt transform
    n = np.linalg.norm(np.asarray(out["descriptors"][0]), axis=-1)
    assert np.isfinite(n).all()


def test_sift_kornia_alias_is_native():
    from gluefactory_tpu.models import get_model

    model = get_model("sift_kornia").from_conf({"max_num_keypoints": 32})
    assert model.conf.backend == "jax"

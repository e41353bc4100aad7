"""On-device homography-pair generation tests: geometric exactness of
H_0to1 (cross-view photoconsistency) and end-to-end training with
`train.device_augment`."""

import pytest
import jax
import jax.numpy as jnp
import numpy as np

from gluefactory_tpu.data.device_homography import (
    generate_homography_pairs,
    sample_corner_homographies,
)
from gluefactory_tpu.geometry.homography import warp_points
from gluefactory_tpu.ops.grid_sample import grid_sample_nd


def test_sampled_homographies_map_frame_to_patch():
    H = sample_corner_homographies(
        jax.random.key(0), 4, (320, 240), (160, 120), difficulty=0.5
    )
    assert H.shape == (4, 3, 3)
    # patch corners map back inside the source frame
    corners = jnp.asarray([[[0.0, 0.0], [160, 0], [160, 120], [0, 120]]] * 4)
    back = np.asarray(warp_points(corners, H, inverse=True))
    assert (back[:, :, 0] >= -1).all() and (back[:, :, 0] <= 321).all()
    assert (back[:, :, 1] >= -1).all() and (back[:, :, 1] <= 241).all()


def test_max_difficulty_homographies_finite():
    """Regression: at difficulty=1.0 the inner center patch degenerates to
    four identical points; the convexity fallback and the window-safety
    lambda=0 anchor must use the size-floored anchor, never a singular DLT
    system (NaN H poisoning the training batch)."""
    for seed in range(4):
        H = sample_corner_homographies(
            jax.random.key(seed), 16, (320, 240), (160, 120), difficulty=1.0
        )
        assert np.isfinite(np.asarray(H)).all()
        # and the homographies are well-conditioned enough to invert
        assert np.isfinite(np.asarray(jnp.linalg.inv(H))).all()


@pytest.mark.slow
def test_cross_view_photoconsistency():
    """A point in view0 mapped by H_0to1 must see the same source content in
    view1 (no photometric jitter)."""
    from gluefactory_tpu.data.homographies import generate_synthetic_image

    src = np.stack([generate_synthetic_image(i, (320, 240)) for i in range(2)])
    batch = generate_homography_pairs(
        jnp.asarray(src), jax.random.key(1), patch_size=(160, 120),
        difficulty=0.4, photometric_strength=0.0,
    )
    img0 = batch["view0"]["image"]
    img1 = batch["view1"]["image"]
    H = batch["H_0to1"]
    rng = np.random.default_rng(0)
    pts0 = jnp.asarray(rng.uniform(30, 90, (2, 200, 2)), jnp.float32)
    pts1 = warp_points(pts0, H)
    inb = np.asarray(
        (pts1[..., 0] > 2) & (pts1[..., 0] < 158) & (pts1[..., 1] > 2) & (pts1[..., 1] < 118)
    )
    v0 = np.asarray(grid_sample_nd(img0, pts0))
    v1 = np.asarray(grid_sample_nd(img1, pts1))
    diff = np.abs(v0 - v1)[inb]
    # bilinear resampling through two warps: small median error
    assert np.median(diff) < 0.05, np.median(diff)


@pytest.mark.slow
def test_training_with_device_augment(tmp_path):
    from gluefactory_tpu.core.config import Config, merge
    from gluefactory_tpu.train import default_conf, main_args, training

    conf = merge(
        Config(default_conf),
        {
            "data": {
                "name": "homographies",
                "synthetic_images": 16,
                "train_size": 8,
                "val_size": 2,
                "train_batch_size": 4,
                "val_batch_size": 2,
                "source_size": [160, 120],
                "emit_source": True,
            },
            "model": {
                "name": "two_view_pipeline",
                "extractor": {
                    "name": "superpoint",
                    "max_num_keypoints": 48,
                    "detection_threshold": 0.0,
                    "force_num_keypoints": True,
                    "trainable": False,
                },
                "matcher": {
                    "name": "lightglue",
                    "n_layers": 2,
                    "descriptor_dim": 64,
                    "num_heads": 2,
                    "checkpointed": False,
                },
                "ground_truth": {"name": "homography_matcher", "th_positive": 3.0},
            },
            "train": {
                "epochs": 1,
                "log_every_iter": 1,
                "eval_every_iter": 1000,
                "device_augment": {
                    "name": "homography",
                    "patch_size": [128, 96],
                    "difficulty": 0.4,
                    "photometric_strength": 0.3,
                },
            },
        },
    )
    args = main_args(["dev_aug_exp", "--no_tensorboard", "--max_val_iters", "1"])
    variables = training(conf, tmp_path / "exp", args)
    for leaf in jax.tree.leaves(variables["params"]):
        assert np.isfinite(np.asarray(leaf)).all()

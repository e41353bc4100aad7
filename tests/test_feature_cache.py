"""End-to-end cached-feature flow: export features to h5, reload through
CacheLoader with padding, train through the pipeline with
`allow_no_extract` (the reference's MegaDepth stage-2 fast path, SURVEY §3.5)."""

import h5py
import jax
import jax.numpy as jnp
import numpy as np

from gluefactory_tpu.models import get_model
from gluefactory_tpu.models.cache_loader import CacheLoader, pad_local_features


def test_pad_local_features():
    pred = {
        "keypoints": np.random.rand(10, 2).astype(np.float32),
        "keypoint_scores": np.random.rand(10).astype(np.float32),
        "descriptors": np.random.rand(10, 32).astype(np.float32),
    }
    out = pad_local_features(pred, 16)
    assert out["keypoints"].shape == (16, 2)
    assert out["descriptors"].shape == (16, 32)
    assert out["keypoint_mask"].sum() == 10
    # truncation
    out2 = pad_local_features(pred, 4)
    assert out2["keypoints"].shape == (4, 2)
    assert out2["keypoint_mask"].all()


def test_cache_loader_roundtrip(tmp_path):
    path = tmp_path / "scene.h5"
    rng = np.random.default_rng(0)
    with h5py.File(path, "w") as f:
        g = f.create_group("img1.jpg")
        g.create_dataset("keypoints", data=rng.uniform(0, 512, (20, 2)).astype(np.float32))
        g.create_dataset("keypoint_scores", data=rng.uniform(0, 1, 20).astype(np.float32))
        g.create_dataset("descriptors", data=rng.normal(size=(20, 64)).astype(np.float16))
    loader = CacheLoader(
        {"path": str(path), "padding_length": 32, "numeric_type": "float32"}
    )
    out = loader({"name": "img1.jpg", "scales": np.array([0.5, 0.5], np.float32)})
    assert out["keypoints"].shape == (32, 2)
    assert out["keypoint_mask"].sum() == 20
    assert out["descriptors"].dtype == np.float32
    # keypoints were rescaled into processed coordinates
    assert out["keypoints"][:20].max() <= 256.0 + 1e-3
    loader.close()


def test_pipeline_with_cached_features():
    """allow_no_extract: the matcher consumes cache features directly, no
    extractor runs (no extractor params needed at all)."""
    pipeline = get_model("two_view_pipeline").from_conf(
        {
            "matcher": {"name": "nearest_neighbor_matcher"},
            "allow_no_extract": True,
        }
    )
    rng = np.random.default_rng(1)
    K, D = 16, 32
    desc = rng.normal(size=(1, K, D)).astype(np.float32)
    cache = {
        "keypoints": jnp.asarray(rng.uniform(0, 256, (1, K, 2)), jnp.float32),
        "keypoint_scores": jnp.asarray(rng.uniform(0, 1, (1, K)), jnp.float32),
        "descriptors": jnp.asarray(desc),
        "keypoint_mask": jnp.ones((1, K), bool),
    }
    data = {
        "view0": {"cache": cache, "image_size": jnp.asarray([[256.0, 256.0]])},
        "view1": {"cache": cache, "image_size": jnp.asarray([[256.0, 256.0]])},
    }
    variables = pipeline.init({"params": jax.random.key(0)}, data)
    pred = pipeline.apply(variables, data)
    # identical descriptors on both sides -> identity matching
    np.testing.assert_array_equal(np.asarray(pred["matches0"])[0], np.arange(K))

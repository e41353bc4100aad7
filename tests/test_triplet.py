"""Triplet pipeline test: 3 synthetic homography views, one stacked matcher
pass, per-pair losses."""

import pytest
import jax
import jax.numpy as jnp
import numpy as np


@pytest.mark.slow
def test_triplet_pipeline_forward_and_loss():
    from gluefactory_tpu.data import get_dataset
    from gluefactory_tpu.data.base_dataset import prepare_batch
    from gluefactory_tpu.models import get_model
    from gluefactory_tpu.train import strip_non_arrays

    ds = get_dataset("homographies")(
        {
            "synthetic_images": 8,
            "train_size": 4,
            "val_size": 2,
            "train_batch_size": 2,
            "triplet": True,
            "source_size": [160, 120],
            "homography": {"patch_shape": [160, 120], "difficulty": 0.4},
            "photometric": {"name": "identity", "p": 0.0},
        }
    )
    batch = next(iter(ds.get_data_loader("train")))
    assert "view2" in batch and "H_0to2" in batch and "H_1to2" in batch
    batch = strip_non_arrays(prepare_batch(batch))

    pipeline = get_model("triplet_pipeline").from_conf(
        {
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
        }
    )
    rngs = {"params": jax.random.key(0), "sample": jax.random.key(1)}
    variables = dict(pipeline.init(rngs, batch, method="initialize"))
    pred = pipeline.apply(variables, batch, train=True, rngs={"sample": jax.random.key(2)})
    assert "keypoints0" in pred and "keypoints2" in pred
    for idx in ("0to1", "0to2", "1to2"):
        assert f"matches0_{idx}" in pred
        assert pred[f"matches0_{idx}"].shape == (2, 48)
    losses, metrics = pipeline.apply(variables, pred, batch, method="loss")
    assert losses["total"].shape == (2,)
    assert np.isfinite(np.asarray(losses["total"])).all()

"""DISK official-weight converter: structure round-trip (fabricated
kornia-layout torch state dict -> our params) + the full
`disk+lightglue-official`-style weights_file loading path.

kornia is not installable here, so the layout is reconstructed from the
public kornia/unets sources (see `convert_disk` docstring for per-field
confidence); these tests pin the converter against the documented layout
and prove the end-to-end loading path, the LoFTR converter standard.
"""

import pytest
import jax
import jax.numpy as jnp
import numpy as np

from gluefactory_tpu.models import get_model


def _fake_disk_sd(rng):
    """kornia DISK checkpoint layout: unet.path_down/path_up block lists,
    each block a ConvBlock Sequential(InstanceNorm2d, PReLU, Conv2d 5x5);
    the first down block is conv-only."""
    sd = {}
    down = [16, 32, 64, 64, 64]
    up = [64, 64, 64, 129]

    def conv(prefix, c_in, c_out, first=False):
        ci = 0 if first else 2
        if not first:
            sd[f"{prefix}.1.weight"] = rng.normal(
                0.25, 0.05, (c_in,)
            ).astype(np.float32)
        sd[f"{prefix}.{ci}.weight"] = rng.normal(
            0, 0.05, (c_out, c_in, 5, 5)
        ).astype(np.float32)
        sd[f"{prefix}.{ci}.bias"] = rng.normal(0, 0.05, (c_out,)).astype(
            np.float32
        )

    c_prev = 3
    for i, c in enumerate(down):
        conv(f"unet.path_down.{i}.conv", c_prev, c, first=i == 0)
        c_prev = c
    skips = down[:-1]
    bottom = down[-1]
    for i, c in enumerate(up):
        conv(f"unet.path_up.{i}.conv", bottom + skips[-(i + 1)], c)
        bottom = c
    return sd


@pytest.mark.slow
def test_disk_converter_roundtrip():
    from gluefactory_tpu.compat.torch_conversion import convert_disk

    rng = np.random.default_rng(0)
    sd = _fake_disk_sd(rng)
    params = convert_disk(sd)

    model = get_model("disk").from_conf({"max_num_keypoints": 64})
    data = {"image": jnp.zeros((1, 64, 80, 3), jnp.float32)}
    ref = model.init(
        {"params": jax.random.key(0), "sample": jax.random.key(1)}, data
    )

    def shapes(t):
        return jax.tree.map(lambda x: jnp.asarray(x).shape, t)

    assert shapes(ref["params"]) == shapes(params)

    img = jnp.asarray(rng.uniform(0, 1, (1, 64, 80, 3)), jnp.float32)
    out = model.apply(
        {"params": params},
        {"image": img, "image_size": jnp.asarray([[80.0, 64.0]])},
        rngs={"sample": jax.random.key(2)},
    )
    assert out["keypoints"].shape == (1, 64, 2)
    assert out["descriptors"].shape == (1, 64, 128)
    assert np.isfinite(np.asarray(out["descriptors"])).all()


@pytest.mark.slow
def test_disk_lightglue_official_weights_path(tmp_path):
    """convert_disk msgpack -> model.extractor.weights_file -> the eval
    loader merges it and the disk+lightglue-official pipeline runs
    (reference disk_kornia.py:8-108 + lightglue wrapper role)."""
    from flax import serialization

    from gluefactory_tpu.compat.torch_conversion import convert_disk, save_params
    from gluefactory_tpu.eval.io import load_model, make_apply_fn

    rng = np.random.default_rng(1)
    params = convert_disk(_fake_disk_sd(rng))
    wf = tmp_path / "disk_depth.msgpack"
    save_params(params, str(wf))

    model, variables = load_model(
        {
            "name": "two_view_pipeline",
            "extractor": {
                "name": "disk",
                "max_num_keypoints": 64,
                "detection_threshold": 0.0,
                "weights_file": str(wf),
            },
            "matcher": {
                "name": "lightglue",
                "input_dim": 128,
                "n_layers": 2,
                "descriptor_dim": 64,
                "num_heads": 2,
                "filter_threshold": 0.1,
            },
            "ground_truth": {"name": None},
        },
        None,
    )
    apply_fn = make_apply_fn(model, variables)
    img = {
        "image": rng.uniform(0, 1, (1, 64, 80, 3)).astype(np.float32),
        "image_size": np.asarray([[80.0, 64.0]], np.float32),
    }
    pred = apply_fn({"view0": img, "view1": dict(img)})
    assert np.asarray(pred["matches0"]).shape == (1, 64)
    assert np.isfinite(np.asarray(pred["matching_scores0"])).all()

    # the merge really replaced the initialized unet with the converted one
    from gluefactory_tpu.eval.io import load_component_weights

    batch = {"view0": img, "view1": dict(img)}
    init_vars = dict(
        model.init(
            {"params": jax.random.key(0), "sample": jax.random.key(1)}, batch
        )
    )
    merged = load_component_weights(model, init_vars)
    got = merged["params"]["extractor_model"]["unet"]["down_0"]["conv"]["kernel"]
    np.testing.assert_array_equal(
        np.asarray(got), np.asarray(params["unet"]["down_0"]["conv"]["kernel"])
    )

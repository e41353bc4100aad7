"""Native KeyNet+HardNet extractor: shapes, masks, rotation behavior."""

import pytest
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


@pytest.mark.slow
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


def test_hardnet_converter_structure_and_forward():
    """convert_hardnet output must load into HardNet exactly; forward parity
    vs an independent numpy evaluation of the canonical affine-free-BN
    HardNet semantics on one conv stage."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from gluefactory_tpu.compat.torch_conversion import convert_hardnet
    from gluefactory_tpu.models.extractors.keynet_affnet_hardnet import HardNet

    rng = np.random.default_rng(0)
    f = lambda *s: rng.normal(0, 0.2, s).astype(np.float32)
    sd = {}
    spec = [(1, 32), (32, 32), (32, 64), (64, 64), (64, 128), (128, 128)]
    for ci, (cin, cout) in zip((0, 3, 6, 9, 12, 15), spec):
        sd[f"features.{ci}.weight"] = f(cout, cin, 3, 3)
        sd[f"features.{ci + 1}.running_mean"] = f(cout)
        sd[f"features.{ci + 1}.running_var"] = np.abs(f(cout)) + 1.0
    sd["features.19.weight"] = f(128, 128, 8, 8)
    sd["features.20.running_mean"] = f(128)
    sd["features.20.running_var"] = np.abs(f(128)) + 1.0

    params, stats = convert_hardnet(sd)
    net = HardNet()
    patches = jnp.asarray(rng.normal(size=(4, 32, 32, 1)), jnp.float32)
    init_vars = net.init(jax.random.key(0), patches)

    def paths(tree):
        return {
            tuple(str(k) for k in p): np.asarray(v).shape
            for p, v in jax.tree_util.tree_flatten_with_path(tree)[0]
        }

    assert paths(params) == paths(init_vars["params"])
    assert paths(stats) == paths(init_vars["batch_stats"])
    out = net.apply({"params": params, "batch_stats": stats}, patches)
    assert out.shape == (4, 128)
    np.testing.assert_allclose(
        np.asarray(jnp.linalg.norm(out, axis=-1)), 1.0, atol=1e-5
    )

    # independent check of stage 0: conv (no bias) + affine-free BN + relu
    x = np.asarray(patches)
    w = sd["features.0.weight"]  # (O, I, 3, 3)
    pad = np.pad(x[..., 0], ((0, 0), (1, 1), (1, 1)))
    y = np.zeros((4, 32, 32, 32), np.float32)
    for o in range(32):
        acc = np.zeros((4, 32, 32), np.float32)
        for dy in range(3):
            for dx in range(3):
                acc += pad[:, dy : dy + 32, dx : dx + 32] * w[o, 0, dy, dx]
        y[..., o] = acc
    y = (y - sd["features.1.running_mean"]) / np.sqrt(
        sd["features.1.running_var"] + 1e-5
    )
    y = np.maximum(y, 0.0)

    stage0 = jax.lax.conv_general_dilated(
        patches,
        jnp.asarray(params["conv0"]["kernel"]),
        (1, 1),
        "SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    stage0 = (stage0 - stats["bn0"]["mean"]) / jnp.sqrt(stats["bn0"]["var"] + 1e-5)
    stage0 = jnp.maximum(stage0, 0.0)
    np.testing.assert_allclose(np.asarray(stage0), y, atol=1e-4)


def _fake_keynet_hardnet_sd(rng):
    """kornia KeyNetHardNet layout: detector.model.feature_extractor.lb_block
    (3x Sequential(Conv 5x5, BN, ReLU)) + detector.model.last_conv.0 (5x5) +
    the LAFDescriptor's HardNet under descriptor.descriptor.features.*."""
    f = lambda *s: rng.normal(0, 0.2, s).astype(np.float32)
    sd = {}
    c_in = 10
    for i in range(3):
        p = f"detector.model.feature_extractor.lb_block.conv{i}"
        sd[f"{p}.0.weight"] = f(8, c_in, 5, 5)
        sd[f"{p}.1.weight"] = f(8) + 1.0
        sd[f"{p}.1.bias"] = f(8)
        sd[f"{p}.1.running_mean"] = f(8)
        sd[f"{p}.1.running_var"] = np.abs(f(8)) + 1.0
        c_in = 8
    sd["detector.model.last_conv.0.weight"] = f(1, 24, 5, 5)
    sd["detector.model.last_conv.0.bias"] = f(1)
    spec = [(1, 32), (32, 32), (32, 64), (64, 64), (64, 128), (128, 128)]
    for ci, (cin, cout) in zip((0, 3, 6, 9, 12, 15), spec):
        sd[f"descriptor.descriptor.features.{ci}.weight"] = f(cout, cin, 3, 3)
        sd[f"descriptor.descriptor.features.{ci + 1}.running_mean"] = f(cout)
        sd[f"descriptor.descriptor.features.{ci + 1}.running_var"] = (
            np.abs(f(cout)) + 1.0
        )
    sd["descriptor.descriptor.features.19.weight"] = f(128, 128, 8, 8)
    sd["descriptor.descriptor.features.20.running_mean"] = f(128)
    sd["descriptor.descriptor.features.20.running_var"] = np.abs(f(128)) + 1.0
    return sd


def test_keynet_hardnet_converter_roundtrip():
    """convert_keynet_hardnet output must slot exactly into the full
    KeyNetAffNetHardNet tree (structure + shapes) and run end-to-end."""
    from gluefactory_tpu.compat.torch_conversion import convert_keynet_hardnet

    rng = np.random.default_rng(5)
    sd = _fake_keynet_hardnet_sd(rng)
    params, stats = convert_keynet_hardnet(sd)

    model = get_model("keynet_affnet_hardnet").from_conf(
        {"max_num_keypoints": 32, "force_num_keypoints": True}
    )
    img = _img(seed=4)
    init_vars = model.init(
        {"params": jax.random.key(0), "sample": jax.random.key(1)},
        {"image": img},
    )

    def paths(tree):
        return {
            tuple(str(k) for k in p): np.asarray(v).shape
            for p, v in jax.tree_util.tree_flatten_with_path(tree)[0]
        }

    assert paths(params) == paths(init_vars["params"])
    assert paths(stats) == paths(init_vars["batch_stats"])
    out = model.apply(
        {"params": params, "batch_stats": stats},
        {"image": img},
        rngs={"sample": jax.random.key(2)},
    )
    assert out["keypoints"].shape == (1, 32, 2)
    assert out["descriptors"].shape == (1, 32, 128)
    assert np.isfinite(np.asarray(out["descriptors"])).all()
    # the converted conv really went through (not the init weights)
    np.testing.assert_array_equal(
        np.asarray(params["keynet"]["last_conv"]["bias"]),
        sd["detector.model.last_conv.0.bias"],
    )


def test_keynet_converter_accepts_standalone_checkpoint():
    """A KeyNet-only checkpoint (no detector./descriptor. prefixes) also
    converts (kornia `KeyNet(pretrained=True)` layout)."""
    from gluefactory_tpu.compat.torch_conversion import convert_keynet

    rng = np.random.default_rng(6)
    sd = {
        k.split("detector.model.", 1)[1]: v
        for k, v in _fake_keynet_hardnet_sd(rng).items()
        if k.startswith("detector.model.")
    }
    params, stats = convert_keynet(sd)
    assert set(params) == {"block", "last_conv"}
    assert params["block"]["conv0"]["kernel"].shape == (5, 5, 10, 8)
    assert stats["block"]["bn2"]["var"].shape == (8,)

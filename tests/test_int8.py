"""int8 quantized extraction path (ops/int8_conv.py, superpoint quantize
conf): layer-level quantization error bounds and end-to-end agreement of
the int8 dense pass with the fp32 reference forward."""

import pytest
import jax
import jax.numpy as jnp
import numpy as np

from gluefactory_tpu.models import get_model
from gluefactory_tpu.ops.int8_conv import (
    int8_conv,
    int8_max_pool,
    quantize_activation,
    quantize_weight,
)


def test_quantize_roundtrip_bounds():
    rng = np.random.default_rng(0)
    w = jnp.asarray(rng.normal(0, 0.05, (3, 3, 32, 64)), jnp.float32)
    w8, s_w = quantize_weight(w)
    err = np.abs(np.asarray(w8, np.float32) * np.asarray(s_w) - np.asarray(w))
    # symmetric per-channel: error <= s_w / 2 elementwise
    assert (err <= np.asarray(s_w) / 2 + 1e-7).all()

    x = jnp.asarray(rng.normal(0, 1.0, (2, 16, 16, 32)), jnp.float32)
    x8, s_x = quantize_activation(x)
    errx = np.abs(np.asarray(x8, np.float32) * float(s_x) - np.asarray(x))
    assert (errx <= float(s_x) / 2 + 1e-6).all()


def test_int8_conv_matches_fp32():
    rng = np.random.default_rng(1)
    x = jnp.asarray(np.maximum(rng.normal(0, 0.5, (2, 32, 32, 16)), 0), jnp.float32)
    w = jnp.asarray(rng.normal(0, 0.1, (3, 3, 16, 32)), jnp.float32)
    b = jnp.asarray(rng.normal(0, 0.05, (32,)), jnp.float32)
    ref = jax.lax.conv_general_dilated(
        x, w, (1, 1), "SAME", dimension_numbers=("NHWC", "HWIO", "NHWC")
    ) + b
    ref = np.maximum(np.asarray(ref), 0.0)
    x8, s_x = quantize_activation(x)
    y = np.asarray(int8_conv(x8, s_x, w, b, relu=True, requant=False), np.float32)
    denom = np.abs(ref).max()
    assert np.abs(y - ref).max() / denom < 0.02, np.abs(y - ref).max() / denom


def test_int8_max_pool_scale_preserving():
    rng = np.random.default_rng(2)
    x = jnp.asarray(rng.normal(0, 1, (1, 8, 8, 4)), jnp.float32)
    x8, s = quantize_activation(x)
    p8 = np.asarray(int8_max_pool(x8), np.float32) * float(s)
    ref = jax.lax.reduce_window(
        np.asarray(x8, np.float32) * float(s), -np.inf, jax.lax.max,
        (1, 2, 2, 1), (1, 2, 2, 1), "VALID",
    )
    assert np.allclose(p8, np.asarray(ref))


@pytest.mark.slow
def test_superpoint_int8_end_to_end_agreement():
    """Full quantized dense pass vs the fp32 forward: the dense score map
    stays highly correlated and descriptors nearly parallel, even with
    random (uncalibrated, worst-case) weights."""
    rng = np.random.default_rng(3)
    data = {"image": jnp.asarray(rng.uniform(0, 1, (2, 128, 128, 1)), jnp.float32)}
    conf = dict(
        max_num_keypoints=64, detection_threshold=0.0, nms_radius=4,
        dense_outputs=True,
    )
    m_fp = get_model("superpoint").from_conf(conf)
    m_q = get_model("superpoint").from_conf({**conf, "quantize": "int8"})
    v = m_fp.init({"params": jax.random.key(0), "sample": jax.random.key(1)}, data)
    p_fp = m_fp.apply(v, data, rngs={"sample": jax.random.key(2)})
    p_q = m_q.apply(v, data, rngs={"sample": jax.random.key(2)})

    s_fp = np.asarray(p_fp["dense_score_map"], np.float64).ravel()
    s_q = np.asarray(p_q["dense_score_map"], np.float64).ravel()
    assert np.corrcoef(s_fp, s_q)[0, 1] > 0.99

    cos = (
        np.asarray(p_fp["dense_descriptors"], np.float64)
        * np.asarray(p_q["dense_descriptors"], np.float64)
    ).sum(-1)
    assert cos.min() > 0.98 and cos.mean() > 0.995

    # most selected keypoints coincide despite a flat random-weight score map
    # (the most permutation-sensitive regime for top-k selection)
    for b_ in range(2):
        a = set(map(tuple, np.asarray(p_fp["keypoints"])[b_]))
        c = set(map(tuple, np.asarray(p_q["keypoints"])[b_]))
        assert len(a & c) / len(a) > 0.5


def test_superpoint_int8_train_falls_back():
    """quantize=int8 must not affect training forwards (train=True uses the
    fp32 path — quantization is inference-only)."""
    rng = np.random.default_rng(4)
    data = {"image": jnp.asarray(rng.uniform(0, 1, (1, 64, 64, 1)), jnp.float32)}
    conf = dict(max_num_keypoints=32, detection_threshold=0.0, quantize="int8")
    m = get_model("superpoint").from_conf(conf)
    m_fp = get_model("superpoint").from_conf({**conf, "quantize": None})
    v = m.init({"params": jax.random.key(0), "sample": jax.random.key(1)}, data)
    out_q = m.apply(v, data, rngs={"sample": jax.random.key(2)}, train=True)
    out_fp = m_fp.apply(v, data, rngs={"sample": jax.random.key(2)}, train=True)
    np.testing.assert_allclose(
        np.asarray(out_q["keypoint_scores"]), np.asarray(out_fp["keypoint_scores"]),
        rtol=1e-6, atol=1e-6,
    )


@pytest.mark.slow
def test_int8_similarity_matcher_close_to_fp():
    """`int8_similarity` (dynamic per-token quantization of the assignment
    similarity) must track the fp path closely and stay mask-inert."""
    import jax
    import jax.numpy as jnp

    from gluefactory_tpu.models import get_model

    rng = np.random.default_rng(0)
    B, M, N, D = 2, 48, 40, 64
    size = jnp.tile(jnp.asarray([[100.0, 100.0]], jnp.float32), (B, 1))
    data = {
        "keypoints0": jnp.asarray(rng.uniform(0, 100, (B, M, 2)), jnp.float32),
        "keypoints1": jnp.asarray(rng.uniform(0, 100, (B, N, 2)), jnp.float32),
        "descriptors0": jnp.asarray(rng.normal(size=(B, M, D)), jnp.float32),
        "descriptors1": jnp.asarray(rng.normal(size=(B, N, D)), jnp.float32),
        "keypoint_mask0": jnp.asarray(rng.uniform(size=(B, M)) > 0.2),
        "keypoint_mask1": jnp.asarray(rng.uniform(size=(B, N)) > 0.2),
        "view0": {"image_size": size},
        "view1": {"image_size": size},
    }
    conf = {
        "n_layers": 2, "input_dim": D, "descriptor_dim": D, "num_heads": 2,
        "flash": False, "checkpointed": False,
    }
    model_fp = get_model("lightglue").from_conf(conf)
    model_q = get_model("lightglue").from_conf({**conf, "int8_similarity": True})
    variables = model_fp.init({"params": jax.random.key(0)}, data)
    pred_fp = model_fp.apply(variables, data)
    pred_q = model_q.apply(variables, data)
    a = np.asarray(pred_fp["log_assignment"])
    b = np.asarray(pred_q["log_assignment"])
    # log-domain scores: small quantization error, same argmax structure
    m0f, m0q = np.asarray(pred_fp["matches0"]), np.asarray(pred_q["matches0"])
    assert (m0f == m0q).mean() > 0.95, (m0f, m0q)
    mask = np.isfinite(a) & np.isfinite(b) & (a > -20)
    err = np.abs(a - b)[mask]
    # log-softmax amplifies the ~1/127 quantization step; bound the tail and
    # the bulk separately
    assert err.max() < 0.5, err.max()
    assert err.mean() < 0.05, err.mean()

    # mask-inertness: garbage in masked slots must not change valid outputs
    data2 = dict(data)
    data2["descriptors0"] = jnp.where(
        data["keypoint_mask0"][..., None], data["descriptors0"], 1e3
    )
    pred_q2 = model_q.apply(variables, data2)
    valid = np.asarray(data["keypoint_mask0"])
    np.testing.assert_array_equal(
        np.asarray(pred_q["matches0"])[valid],
        np.asarray(pred_q2["matches0"])[valid],
    )

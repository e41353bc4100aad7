"""Parity tests for the fused detection-decode Pallas kernel (interpret
mode on CPU) against the ops/nms.py XLA composition."""

import jax.numpy as jnp
import numpy as np

from gluefactory_tpu.ops.nms import simple_nms, top_k_keypoints
from gluefactory_tpu.ops.pallas_detect import (
    detect_keypoints,
    fused_nms_tile_reduce,
    nms_tile_reduce_xla,
)


def test_fused_nms_tile_reduce_single_chunk():
    rng = np.random.default_rng(0)
    scores = jnp.asarray(rng.uniform(0.01, 1.0, (2, 64, 128)), jnp.float32)
    tm, ta = fused_nms_tile_reduce(scores, interpret=True)
    rm, ra = nms_tile_reduce_xla(scores, 4, 2, 4, 4)
    np.testing.assert_array_equal(np.asarray(tm), np.asarray(rm))
    np.testing.assert_array_equal(np.asarray(ta), np.asarray(ra))


def test_fused_nms_tile_reduce_multi_chunk():
    """H=512 -> two 256-row chunks; halo exchange must be exact."""
    rng = np.random.default_rng(1)
    scores = jnp.asarray(rng.uniform(0.01, 1.0, (1, 512, 128)), jnp.float32)
    tm, ta = fused_nms_tile_reduce(scores, interpret=True)
    rm, ra = nms_tile_reduce_xla(scores, 4, 2, 4, 4)
    np.testing.assert_array_equal(np.asarray(tm), np.asarray(rm))
    np.testing.assert_array_equal(np.asarray(ta), np.asarray(ra))


def test_fused_nms_tile_reduce_bf16_input():
    rng = np.random.default_rng(2)
    scores = jnp.asarray(
        rng.uniform(0.01, 1.0, (1, 64, 128)), jnp.float32
    ).astype(jnp.bfloat16)
    tm, ta = fused_nms_tile_reduce(scores, interpret=True)
    rm, ra = nms_tile_reduce_xla(scores, 4, 2, 4, 4)
    np.testing.assert_array_equal(np.asarray(tm), np.asarray(rm))
    np.testing.assert_array_equal(np.asarray(ta), np.asarray(ra))


def test_fused_nms_true_size_mask():
    """Scores beyond the true image area must be suppressed exactly as in
    the XLA path (bucket-padded buffers)."""
    rng = np.random.default_rng(3)
    scores = jnp.asarray(rng.uniform(0.01, 1.0, (2, 64, 128)), jnp.float32)
    true_size = jnp.asarray([[100.0, 50.0], [128.0, 64.0]], jnp.float32)
    tm, ta = fused_nms_tile_reduce(scores, true_size, interpret=True)
    rm, ra = nms_tile_reduce_xla(scores, 4, 2, 4, 4, true_size=true_size)
    np.testing.assert_array_equal(np.asarray(tm), np.asarray(rm))
    np.testing.assert_array_equal(np.asarray(ta), np.asarray(ra))


def test_detect_keypoints_matches_topk_path():
    rng = np.random.default_rng(4)
    scores = jnp.asarray(rng.uniform(0.01, 1.0, (2, 64, 128)), jnp.float32)
    k = 32
    kpts, vals, valid = detect_keypoints(
        scores, k, 0.3, border=4, interpret=True
    )
    # XLA reference: nms -> border -> tiled top-k (as superpoint._forward)
    from gluefactory_tpu.ops.nms import remove_borders

    nmsed = remove_borders(simple_nms(scores, 4), 4)
    rk, rv, rvalid = top_k_keypoints(nmsed, k, 0.3, nms_radius=4)
    np.testing.assert_array_equal(np.asarray(valid), np.asarray(rvalid))
    np.testing.assert_allclose(np.asarray(vals), np.asarray(rv), atol=0)
    # compare keypoint sets among valid entries (top-k tie order may differ)
    for b in range(2):
        got = {tuple(x) for x in np.asarray(kpts[b])[np.asarray(valid[b])]}
        ref = {tuple(x) for x in np.asarray(rk[b])[np.asarray(rvalid[b])]}
        assert got == ref


def test_superpoint_fused_paths_match_xla(monkeypatch):
    """SuperPoint forward with fused_detect + fused_backbone (interpret mode)
    must reproduce the XLA path end-to-end (keypoints, scores, descriptors)."""
    import jax

    from gluefactory_tpu.models import get_model
    from gluefactory_tpu.ops import pallas_conv, pallas_detect

    rng = np.random.default_rng(5)
    img = jnp.asarray(rng.uniform(0, 1, (2, 64, 128, 1)), jnp.float32)
    size = jnp.tile(jnp.asarray([[128.0, 64.0]]), (2, 1))
    data = {"image": img, "image_size": size}

    sp = get_model("superpoint").from_conf(
        {"max_num_keypoints": 32, "detection_threshold": 0.0,
         "fused_detect": False, "fused_backbone": False}
    )
    variables = sp.init(
        {"params": jax.random.key(0), "sample": jax.random.key(1)}, data
    )
    ref = sp.apply(variables, data, rngs={"sample": jax.random.key(2)})

    monkeypatch.setattr(pallas_conv, "FORCE_INTERPRET", True)
    monkeypatch.setattr(pallas_detect, "FORCE_INTERPRET", True)
    sp2 = get_model("superpoint").from_conf(
        {"max_num_keypoints": 32, "detection_threshold": 0.0,
         "fused_detect": True, "fused_backbone": True}
    )
    out = sp2.apply(variables, data, rngs={"sample": jax.random.key(2)})

    np.testing.assert_array_equal(
        np.asarray(out["keypoint_mask"]), np.asarray(ref["keypoint_mask"]))
    # fused backbone accumulates f32 like XLA convs: tight tolerance
    np.testing.assert_allclose(
        np.asarray(out["keypoints"]), np.asarray(ref["keypoints"]), atol=1e-3)
    np.testing.assert_allclose(
        np.asarray(out["keypoint_scores"]), np.asarray(ref["keypoint_scores"]),
        atol=1e-5)
    np.testing.assert_allclose(
        np.asarray(out["descriptors"]), np.asarray(ref["descriptors"]),
        atol=1e-3)

"""RoMa warp->match machinery on synthetic warps (reference
`models/matchers/roma.py:44-153,401-441` semantics, backbone-free)."""

import jax
import jax.numpy as jnp
import numpy as np

from gluefactory_tpu.models.matchers.roma import (
    cycle_dist,
    denormalize_coords,
    flow_to_warp,
    get_pixel_grid,
    match_keypoints_dense,
    normalize_coords,
    sample_matches,
)


def homography_warp_field(H, h, w, t_hw):
    """Dense normalized warp (1, h, w, 2) mapping pixel centers through H."""
    grid = np.asarray(get_pixel_grid(h, w))  # (h, w, 2) COLMAP centers
    pts = grid.reshape(-1, 2)
    ph = np.concatenate([pts, np.ones((pts.shape[0], 1))], axis=-1) @ np.asarray(H).T
    warped = ph[:, :2] / ph[:, 2:]
    n = np.asarray(normalize_coords(jnp.asarray(warped, jnp.float32), t_hw))
    return jnp.asarray(n.reshape(1, h, w, 2))


def test_normalize_denormalize_roundtrip():
    rng = np.random.default_rng(0)
    pts = jnp.asarray(rng.uniform(0, 100, (1, 30, 2)), jnp.float32)
    back = denormalize_coords(normalize_coords(pts, (120, 100)), (120, 100))
    np.testing.assert_allclose(np.asarray(back), np.asarray(pts), atol=1e-4)


def test_flow_to_warp_semantics():
    rng = np.random.default_rng(1)
    B, H, W = 1, 16, 20
    flow = jnp.asarray(rng.uniform(-0.9, 0.9, (B, H, W, 2)), jnp.float32)
    flow = flow.at[0, 0, 0].set(jnp.asarray([1.5, 0.0]))  # out of range
    logits = jnp.asarray(rng.normal(0, 2, (B, H, W)), jnp.float32)
    out = flow_to_warp(flow, logits)
    cert = np.asarray(out["certainty"])
    assert cert[0, 0, 0] == 0.0  # out-of-range flow is zero-certainty
    np.testing.assert_allclose(
        cert[0, 1:, :], jax.nn.sigmoid(logits)[0, 1:, :], atol=1e-6
    )
    assert np.abs(np.asarray(out["warp"])).max() <= 1.0

    # low-res certainty subtraction: only negative lr logits contribute
    lr = jnp.full((B, 4, 5), 3.0)  # positive -> no effect
    out2 = flow_to_warp(flow, logits, lr_certainty=lr)
    np.testing.assert_allclose(
        np.asarray(out2["certainty"]), cert, atol=1e-6
    )
    lr_neg = jnp.full((B, 4, 5), -4.0)
    out3 = flow_to_warp(flow, logits, lr_certainty=lr_neg)
    expected = jax.nn.sigmoid(logits - 0.5 * (-4.0))
    np.testing.assert_allclose(
        np.asarray(out3["certainty"])[0, 1:], np.asarray(expected)[0, 1:], atol=1e-5
    )

    outq = flow_to_warp(flow, logits, extract_query_coords=True)
    q = np.asarray(outq["q_coords"])[0]
    # reference linspace(-1 + 1/h, 1 - 1/h, h): first/last pixel centers
    np.testing.assert_allclose(q[0, 0], [-1 + 1 / W, -1 + 1 / H], atol=1e-6)
    np.testing.assert_allclose(q[-1, -1], [1 - 1 / W, 1 - 1 / H], atol=1e-6)


def test_match_keypoints_dense_homography():
    rng = np.random.default_rng(2)
    h0 = w0 = 64
    h1, w1 = 64, 80
    H = np.asarray(
        [[1.05, 0.02, 3.0], [-0.01, 0.98, -2.0], [1e-4, 0.0, 1.0]], np.float64
    )
    warp0 = homography_warp_field(H, h0, w0, (h1, w1))
    warp1 = homography_warp_field(np.linalg.inv(H), h1, w1, (h0, w0))
    pred = {
        "warp0": warp0,
        "warp1": warp1,
        "certainty0": jnp.ones((1, h0, w0)),
        "certainty1": jnp.ones((1, h1, w1)),
    }
    N = 24
    kpts0 = rng.uniform(8, 56, (1, N, 2)).astype(np.float32)
    ph = np.concatenate([kpts0[0], np.ones((N, 1))], -1) @ H.T
    kpts1 = (ph[:, :2] / ph[:, 2:]).astype(np.float32)[None]
    perm = rng.permutation(N)
    data = {
        "view0": {"image": jnp.zeros((1, h0, w0, 1))},
        "view1": {"image": jnp.zeros((1, h1, w1, 1))},
        "keypoints0": jnp.asarray(kpts0),
        "keypoints1": jnp.asarray(kpts1[:, perm]),
    }
    out = match_keypoints_dense(pred, data, max_kp_error=2.0, filter_threshold=0.5)
    m0 = np.asarray(out["matches0"])[0]
    expected = np.argsort(perm)
    assert (m0 == expected).mean() > 0.9  # dense-grid interpolation is ~exact
    # matches1 is the inverse permutation relation
    m1 = np.asarray(out["matches1"])[0]
    valid = m0 >= 0
    assert (m1[m0[valid]] == np.arange(N)[valid]).all()

    # max_kp_error gating: far-away target keypoints never match
    data_far = dict(data, keypoints1=data["keypoints1"] + 30.0)
    out_far = match_keypoints_dense(pred, data_far, 2.0, 0.5)
    assert (np.asarray(out_far["matches0"]) == -1).all()

    # mask inertness: masked target slots cannot be matched
    mask1 = np.ones((1, N), bool)
    mask1[0, expected[0]] = False
    out_m = match_keypoints_dense(
        pred, {**data, "keypoint_mask1": jnp.asarray(mask1)}, 2.0, 0.5
    )
    assert np.asarray(out_m["matches0"])[0, 0] == -1

    # certainty threshold gating
    pred_low = dict(pred, certainty0=jnp.zeros((1, h0, w0)))
    out_low = match_keypoints_dense(pred_low, data, 2.0, 0.5)
    assert (np.asarray(out_low["matches0"]) == -1).all()


def test_cycle_dist_inverse_warps():
    H = np.asarray([[1.02, 0.0, 5.0], [0.01, 0.99, -3.0], [0.0, 0.0, 1.0]])
    h, w = 48, 64
    warp0 = homography_warp_field(H, h, w, (h, w))
    warp1 = homography_warp_field(np.linalg.inv(H), h, w, (h, w))
    err = np.asarray(cycle_dist(warp0, warp1))
    # interior pixels round-trip to themselves up to the reference's own
    # mixed coordinate conventions (normalize/denormalize use the (W-1)
    # align-corners=True scale while grid sampling is align_corners=False,
    # reference utils/image.py:136-229) — a systematic ~1px bias
    assert np.median(err[0, 8:-8, 8:-8]) < 1.5


def test_sample_matches_static_shape_and_consistency():
    H = np.asarray([[1.0, 0.0, 4.0], [0.0, 1.0, -2.0], [0.0, 0.0, 1.0]])
    h, w = 32, 40
    warp0 = homography_warp_field(H, h, w, (h, w))
    warp1 = homography_warp_field(np.linalg.inv(H), h, w, (h, w))
    cert = jnp.ones((1, h, w)) * 0.9
    pred = {"warp0": warp0, "warp1": warp1, "certainty0": cert, "certainty1": cert}
    num = 64
    out = sample_matches(pred, (h, w), (h, w), num, jax.random.key(0))
    assert out["keypoints0"].shape == (1, num, 2)
    assert out["keypoints1"].shape == (1, num, 2)
    assert (np.asarray(out["matches0"])[0] == np.arange(num)).all()
    # sampled pairs satisfy the homography (pure translation here)
    k0 = np.asarray(out["keypoints0"])[0]
    k1 = np.asarray(out["keypoints1"])[0]
    keep = np.asarray(out["keypoint_mask0"])[0]
    inside = keep & (k0[:, 0] > 4) & (k0[:, 0] < w - 8) & (k0[:, 1] > 4) & (k0[:, 1] < h - 6)
    assert inside.sum() > 10
    d = np.linalg.norm((k0[inside] + np.asarray([4.0, -2.0])) - k1[inside], axis=-1)
    assert np.median(d) < 1.0


def test_roma_model_forward():
    from gluefactory_tpu.models import get_model

    H = np.asarray([[1.0, 0.0, 6.0], [0.0, 1.0, 1.0], [0.0, 0.0, 1.0]])
    h, w = 32, 40
    warp0 = homography_warp_field(H, h, w, (h, w))
    warp1 = homography_warp_field(np.linalg.inv(H), h, w, (h, w))
    cert = jnp.ones((1, h, w))
    rng = np.random.default_rng(5)
    N = 12
    kpts0 = rng.uniform(8, 24, (1, N, 2)).astype(np.float32)
    kpts1 = kpts0 + np.asarray([6.0, 1.0], np.float32)
    data = {
        "view0": {"image": jnp.zeros((1, h, w, 1))},
        "view1": {"image": jnp.zeros((1, h, w, 1))},
        "warp0": warp0,
        "warp1": warp1,
        "certainty0": cert,
        "certainty1": cert,
        "keypoints0": jnp.asarray(kpts0),
        "keypoints1": jnp.asarray(kpts1),
    }
    roma = get_model("roma").from_conf({"add_cycle_error": True})
    pred = roma.apply({}, data, rngs={"sample": jax.random.key(0)})
    assert (np.asarray(pred["matches0"])[0] == np.arange(N)).all()
    # ~1px systematic bias from the reference's mixed conventions (see
    # test_cycle_dist_inverse_warps)
    assert np.median(np.asarray(pred["cycle_error0"])[0, 8:-8, 8:-8]) < 1.5

    # dense sampling mode
    roma_s = get_model("roma").from_conf({"sample_num_matches": 32})
    pred_s = roma_s.apply({}, data, rngs={"sample": jax.random.key(1)})
    assert pred_s["keypoints0"].shape == (1, 32, 2)

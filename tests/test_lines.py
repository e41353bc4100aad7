"""Tests for the line stack: LSD detection, wireframe junction clustering,
GlueStick forward/loss, line GT generation with the batched greedy LAP."""

import pytest
import cv2
import jax
import jax.numpy as jnp
import numpy as np

from gluefactory_tpu.geometry.gt_lines import (
    greedy_assignment,
    gt_line_matches_from_homography,
    point_line_distances,
    sample_points_on_lines,
)
from gluefactory_tpu.models.lines.lsd import detect_lsd_host
from gluefactory_tpu.models.lines.wireframe import cluster_endpoints_host


def make_line_image(w=320, h=240, seed=0):
    rng = np.random.default_rng(seed)
    img = np.full((h, w, 3), 0.9, np.float32)
    lines = []
    for _ in range(8):
        p0 = rng.uniform([20, 20], [w - 20, h - 20])
        ang = rng.uniform(0, np.pi)
        ln = rng.uniform(60, 120)
        p1 = p0 + ln * np.array([np.cos(ang), np.sin(ang)])
        p1 = np.clip(p1, 5, [w - 5, h - 5])
        cv2.line(img, tuple(p0.astype(int)), tuple(p1.astype(int)), (0.1, 0.1, 0.1), 3)
        lines.append([p0, p1])
    return img, np.array(lines)


def test_lsd_detects_lines():
    img, gt_lines = make_line_image()
    lines, scores, valid = detect_lsd_host(img[None], max_lines=50, min_length=20)
    n = valid[0].sum()
    assert n >= 6, f"only {n} lines detected"
    assert scores[0, :n].max() <= 1.0 + 1e-6


def test_cluster_endpoints():
    # two lines sharing an endpoint within radius -> 3 junctions
    lines = np.array(
        [[[10.0, 10.0], [50.0, 10.0]], [[50.5, 10.5], [50.0, 60.0]]], np.float32
    )
    valid = np.ones(2, bool)
    junctions, counts, jvalid, assign = cluster_endpoints_host(lines, valid, radius=2.0)
    assert jvalid.sum() == 3
    assert assign[0, 1] == assign[1, 0]  # shared junction
    # merged position is the mean
    np.testing.assert_allclose(junctions[assign[0, 1]], [50.25, 10.25], atol=1e-4)


def test_greedy_assignment():
    scores = jnp.asarray(
        [[[0.9, 0.1, 0.0], [0.2, 0.8, 0.0], [0.0, 0.0, 0.05]]], jnp.float32
    )
    m0, m1 = greedy_assignment(scores, min_score=0.2)
    np.testing.assert_array_equal(np.asarray(m0)[0], [0, 1, -1])
    np.testing.assert_array_equal(np.asarray(m1)[0], [0, 1, -1])


def test_point_line_distance():
    lines = jnp.asarray([[[[0.0, 0.0], [10.0, 0.0]]]])  # one horizontal segment
    pts = jnp.asarray([[[[5.0, 2.0], [20.0, 0.0]]]])  # (B,1,2,2) samples
    dist, in_seg = point_line_distances(pts, lines)
    assert abs(float(dist[0, 0, 0, 0]) - 2.0) < 1e-5
    assert bool(in_seg[0, 0, 0, 0])
    assert not bool(in_seg[0, 0, 1, 0])  # beyond the segment end


def test_gt_line_matches_identity():
    rng = np.random.default_rng(1)
    L = 6
    p0 = rng.uniform(50, 200, (1, L, 2)).astype(np.float32)
    d = rng.uniform(-40, 40, (1, L, 2)).astype(np.float32)
    lines0 = jnp.asarray(np.stack([p0, p0 + d], axis=2))  # (1, L, 2, 2)
    perm = rng.permutation(L)
    lines1 = lines0[:, perm]
    H = jnp.eye(3)[None]
    mask = jnp.ones((1, L), bool)
    out = gt_line_matches_from_homography(
        lines0, lines1, mask, mask, (256, 256), (256, 256), H
    )
    m0 = np.asarray(out["matches0"])[0]
    # each line matches its permuted twin
    expected = np.argsort(perm)
    np.testing.assert_array_equal(m0, expected)


@pytest.mark.slow
def test_gluestick_forward_and_loss():
    from gluefactory_tpu.models import get_model

    B, N, L, D = 1, 40, 8, 64
    rng = np.random.default_rng(2)
    gs = get_model("gluestick").from_conf(
        {"n_layers": 2, "descriptor_dim": D, "input_dim": D, "num_heads": 2}
    )
    junc_idx = rng.integers(0, 16, (B, L, 2))
    data = {
        "keypoints0": jnp.asarray(rng.uniform(0, 512, (B, N, 2)), jnp.float32),
        "keypoints1": jnp.asarray(rng.uniform(0, 512, (B, N, 2)), jnp.float32),
        "descriptors0": jnp.asarray(rng.normal(size=(B, N, D)), jnp.float32),
        "descriptors1": jnp.asarray(rng.normal(size=(B, N, D)), jnp.float32),
        "keypoint_scores0": jnp.asarray(rng.uniform(0, 1, (B, N)), jnp.float32),
        "keypoint_scores1": jnp.asarray(rng.uniform(0, 1, (B, N)), jnp.float32),
        "lines0": jnp.asarray(rng.uniform(0, 512, (B, L, 2, 2)), jnp.float32),
        "lines1": jnp.asarray(rng.uniform(0, 512, (B, L, 2, 2)), jnp.float32),
        "lines_junc_idx0": jnp.asarray(junc_idx, jnp.int32),
        "lines_junc_idx1": jnp.asarray(junc_idx, jnp.int32),
        "line_scores0": jnp.asarray(rng.uniform(0, 1, (B, L)), jnp.float32),
        "line_scores1": jnp.asarray(rng.uniform(0, 1, (B, L)), jnp.float32),
        "keypoint_mask0": jnp.ones((B, N), bool),
        "keypoint_mask1": jnp.ones((B, N), bool),
        "line_mask0": jnp.ones((B, L), bool).at[:, L - 2 :].set(False),
        "line_mask1": jnp.ones((B, L), bool).at[:, L - 2 :].set(False),
        "view0": {"image_size": jnp.asarray([[512.0, 512.0]])},
        "view1": {"image_size": jnp.asarray([[512.0, 512.0]])},
    }
    variables = gs.init(
        {"params": jax.random.key(0)}, data, method="initialize"
    )
    pred = gs.apply(variables, data)
    assert pred["log_assignment"].shape == (B, N + 1, N + 1)
    assert pred["line_log_assignment"].shape == (B, L + 1, L + 1)
    assert (np.asarray(pred["line_matches0"])[:, L - 2 :] == -1).all()

    # loss with synthetic GT
    data["gt_matches0"] = jnp.asarray(rng.integers(-1, N, (B, N)), jnp.int32)
    data["gt_matches1"] = jnp.full((B, N), -1, jnp.int32)
    data["gt_assignment"] = jnp.zeros((B, N, N), bool)
    data["gt_line_matches0"] = jnp.asarray(rng.integers(-1, L, (B, L)), jnp.int32)
    data["gt_line_matches1"] = jnp.full((B, L), -1, jnp.int32)
    data["gt_line_assignment"] = jnp.zeros((B, L, L), bool)
    losses, metrics = gs.apply(variables, pred, data, method="loss")
    assert np.isfinite(np.asarray(losses["total"])).all()


def test_wireframe_extractor_end_to_end():
    from gluefactory_tpu.models import get_model

    img, _ = make_line_image(seed=3)
    wf = get_model("wireframe").from_conf(
        {
            "point_extractor": {
                "name": "superpoint",
                "max_num_keypoints": 64,
                "detection_threshold": 0.0,
            },
            "max_num_lines": 32,
            "min_length": 20.0,
        }
    )
    data = {"image": jnp.asarray(img[None])}
    variables = wf.init({"params": jax.random.key(0)}, data)
    pred = wf.apply(variables, data)
    J = 64  # 2 * max_num_lines
    assert pred["lines"].shape == (1, 32, 2, 2)
    assert pred["keypoints"].shape[1] == J + 64
    assert int(np.asarray(pred["line_mask"]).sum()) >= 6
    # lines_junc_idx points at junction slots (< J) and junctions are valid
    idx = np.asarray(pred["lines_junc_idx"])[0]
    lm = np.asarray(pred["line_mask"])[0]
    assert (idx[lm] < J).all()
    km = np.asarray(pred["keypoint_mask"])[0]
    assert km[idx[lm].ravel()].all()


def test_wireframe_precomputed_lines_parity():
    """The data-pipeline precompute path (detect_lines) must produce exactly
    the same extractor outputs as the in-model host-callback path."""
    from gluefactory_tpu.models import get_model
    from gluefactory_tpu.models.lines.wireframe import precompute_wireframe

    img, _ = make_line_image(seed=5)
    conf = {
        "point_extractor": {
            "name": "superpoint",
            "max_num_keypoints": 64,
            "detection_threshold": 0.0,
        },
        "max_num_lines": 32,
        "min_length": 20.0,
        "nms_radius": 3.0,
    }
    wf = get_model("wireframe").from_conf(conf)
    data_cb = {"image": jnp.asarray(img[None])}
    variables = wf.init({"params": jax.random.key(0)}, data_cb)
    pred_cb = wf.apply(variables, data_cb)

    pre = precompute_wireframe(img, 32, 20.0, 3.0)
    data_pre = {"image": jnp.asarray(img[None])}
    data_pre.update({k: jnp.asarray(v)[None] for k, v in pre.items()})
    pred_pre = jax.jit(lambda v, d: wf.apply(v, d))(variables, data_pre)

    for k in pred_cb:
        np.testing.assert_allclose(
            np.asarray(pred_cb[k]), np.asarray(pred_pre[k]), atol=1e-5,
            err_msg=f"mismatch in {k}",
        )


@pytest.mark.slow
def test_gluestick_inter_supervision():
    from gluefactory_tpu.models import get_model

    B, N, L, D = 1, 24, 6, 32
    rng = np.random.default_rng(4)
    gs = get_model("gluestick").from_conf(
        {"n_layers": 3, "descriptor_dim": D, "input_dim": D, "num_heads": 2,
         "inter_supervision": [1]}
    )
    junc_idx = rng.integers(0, 12, (B, L, 2))
    data = {
        "keypoints0": jnp.asarray(rng.uniform(0, 512, (B, N, 2)), jnp.float32),
        "keypoints1": jnp.asarray(rng.uniform(0, 512, (B, N, 2)), jnp.float32),
        "descriptors0": jnp.asarray(rng.normal(size=(B, N, D)), jnp.float32),
        "descriptors1": jnp.asarray(rng.normal(size=(B, N, D)), jnp.float32),
        "keypoint_scores0": jnp.asarray(rng.uniform(0, 1, (B, N)), jnp.float32),
        "keypoint_scores1": jnp.asarray(rng.uniform(0, 1, (B, N)), jnp.float32),
        "lines0": jnp.asarray(rng.uniform(0, 512, (B, L, 2, 2)), jnp.float32),
        "lines1": jnp.asarray(rng.uniform(0, 512, (B, L, 2, 2)), jnp.float32),
        "lines_junc_idx0": jnp.asarray(junc_idx, jnp.int32),
        "lines_junc_idx1": jnp.asarray(junc_idx, jnp.int32),
        "line_scores0": jnp.asarray(rng.uniform(0, 1, (B, L)), jnp.float32),
        "line_scores1": jnp.asarray(rng.uniform(0, 1, (B, L)), jnp.float32),
        "view0": {"image_size": jnp.asarray([[512.0, 512.0]])},
        "view1": {"image_size": jnp.asarray([[512.0, 512.0]])},
        "gt_matches0": jnp.full((B, N), -1, jnp.int32),
        "gt_matches1": jnp.full((B, N), -1, jnp.int32),
        "gt_assignment": jnp.zeros((B, N, N), bool),
        "gt_line_matches0": jnp.full((B, L), -1, jnp.int32),
        "gt_line_matches1": jnp.full((B, L), -1, jnp.int32),
        "gt_line_assignment": jnp.zeros((B, L, L), bool),
    }
    variables = gs.init({"params": jax.random.key(0)}, data, method="initialize")
    pred, _ = gs.apply(variables, data, train=True, mutable=["batch_stats"])
    assert "line_1_log_assignment" in pred
    losses, _ = gs.apply(variables, pred, data, method="loss")
    assert "line_1_assignment_nll" in losses
    assert np.isfinite(np.asarray(losses["total"])).all()


def test_gt_line_matches_from_pose_depth():
    """Flat fronto-parallel scene: lines shifted by a pure translation must
    match 1:1 through the depth-based line GT."""
    from gluefactory_tpu.geometry.gt_lines import gt_line_matches_from_pose_depth
    from gluefactory_tpu.geometry.wrappers import Camera, Pose

    rng = np.random.default_rng(7)
    W = H = 64
    f = 100.0
    cam = Camera(
        size=jnp.asarray([[float(W), float(H)]]),
        f=jnp.asarray([[f, f]]),
        c=jnp.asarray([[W / 2.0, H / 2.0]]),
    )
    depth = jnp.full((1, H, W), 5.0)
    t = np.array([0.5, 0.0, 0.0], np.float32)  # shifts pixels by f*t/z = 10px
    T = Pose(jnp.eye(3)[None], jnp.asarray(t[None]))
    L = 5
    p0 = rng.uniform(15, 35, (1, L, 2)).astype(np.float32)
    d = rng.uniform(-10, 10, (1, L, 2)).astype(np.float32)
    lines0 = jnp.asarray(np.stack([p0, p0 + d], axis=2))
    shift = f * t[0] / 5.0  # +10 px in x
    lines1 = lines0 + jnp.asarray([shift, 0.0])
    mask = jnp.ones((1, L), bool)
    out = gt_line_matches_from_pose_depth(
        lines0, lines1, mask, mask, cam, cam, T, depth, depth
    )
    np.testing.assert_array_equal(np.asarray(out["matches0"])[0], np.arange(L))


def test_gluestick_line_attention_variant():
    """`line_attention: True` (reference gluestick.py:613-691): forward runs,
    shapes match, and masked line slots stay inert."""
    from gluefactory_tpu.models import get_model

    B, N, L, D = 1, 24, 6, 32
    rng = np.random.default_rng(7)
    gs = get_model("gluestick").from_conf(
        {"n_layers": 2, "descriptor_dim": D, "input_dim": D, "num_heads": 2,
         "line_attention": True}
    )
    junc_idx = rng.integers(0, 12, (B, L, 2))
    data = {
        "keypoints0": jnp.asarray(rng.uniform(0, 256, (B, N, 2)), jnp.float32),
        "keypoints1": jnp.asarray(rng.uniform(0, 256, (B, N, 2)), jnp.float32),
        "descriptors0": jnp.asarray(rng.normal(size=(B, N, D)), jnp.float32),
        "descriptors1": jnp.asarray(rng.normal(size=(B, N, D)), jnp.float32),
        "keypoint_scores0": jnp.asarray(rng.uniform(0, 1, (B, N)), jnp.float32),
        "keypoint_scores1": jnp.asarray(rng.uniform(0, 1, (B, N)), jnp.float32),
        "lines0": jnp.asarray(rng.uniform(0, 256, (B, L, 2, 2)), jnp.float32),
        "lines1": jnp.asarray(rng.uniform(0, 256, (B, L, 2, 2)), jnp.float32),
        "lines_junc_idx0": jnp.asarray(junc_idx, jnp.int32),
        "lines_junc_idx1": jnp.asarray(junc_idx, jnp.int32),
        "line_scores0": jnp.asarray(rng.uniform(0, 1, (B, L)), jnp.float32),
        "line_scores1": jnp.asarray(rng.uniform(0, 1, (B, L)), jnp.float32),
        "keypoint_mask0": jnp.ones((B, N), bool),
        "keypoint_mask1": jnp.ones((B, N), bool),
        "line_mask0": jnp.ones((B, L), bool).at[:, L - 2 :].set(False),
        "line_mask1": jnp.ones((B, L), bool).at[:, L - 2 :].set(False),
        "view0": {"image_size": jnp.asarray([[256.0, 256.0]])},
        "view1": {"image_size": jnp.asarray([[256.0, 256.0]])},
    }
    variables = gs.init({"params": jax.random.key(0)}, data, method="initialize")
    pred = gs.apply(variables, data)
    assert pred["log_assignment"].shape == (B, N + 1, N + 1)
    assert pred["line_log_assignment"].shape == (B, L + 1, L + 1)
    assert np.isfinite(np.asarray(pred["log_assignment"])).any()
    assert (np.asarray(pred["line_matches0"])[:, L - 2 :] == -1).all()


def test_cluster_endpoints_dbscan_chain_and_scores():
    """Transitive eps-chains must merge into ONE junction (DBSCAN
    min_samples=1 semantics, reference wireframe.py:55) and junction scores
    are the mean of member LINE scores."""
    # endpoints at x = 0, 1.8, 3.6: pairwise 0-1.8 and 1.8-3.6 within eps=2,
    # 0-3.6 not — a chain that greedy nearest-center clustering would split
    lines = np.array(
        [
            [[0.0, 0.0], [100.0, 0.0]],
            [[1.8, 0.0], [100.0, 50.0]],
            [[3.6, 0.0], [0.0, 100.0]],
        ],
        np.float32,
    )
    valid = np.ones(3, bool)
    scores = np.array([0.3, 0.6, 0.9], np.float32)
    junctions, jscores, jvalid, assign = cluster_endpoints_host(
        lines, valid, radius=2.0, line_scores=scores
    )
    # chain start endpoints merge into one junction; 3 far endpoints stay
    assert jvalid.sum() == 4
    assert assign[0, 0] == assign[1, 0] == assign[2, 0]
    j = assign[0, 0]
    np.testing.assert_allclose(junctions[j], [1.8, 0.0], atol=1e-5)
    np.testing.assert_allclose(jscores[j], (0.3 + 0.6 + 0.9) / 3, atol=1e-5)
    # singleton junction score = its line's score
    np.testing.assert_allclose(jscores[assign[0, 1]], 0.3, atol=1e-6)


@pytest.mark.slow
def test_gluestick_checkpointed_trains():
    """`checkpointed: True` (the SHIPPED gluestick recipe default) must
    support train=True forwards + grads: nn.remat needs `train` static or
    BatchNorm's python branch breaks tracing (round-5 self-review found the
    recipe default had never been exercised — every test forced False)."""
    from gluefactory_tpu.models import get_model

    B, N, L, D = 1, 24, 6, 64
    rng = np.random.default_rng(3)
    gs = get_model("gluestick").from_conf(
        {
            "n_layers": 2,
            "descriptor_dim": D,
            "input_dim": D,
            "num_heads": 2,
            "checkpointed": True,
        }
    )
    junc_idx = rng.integers(0, 12, (B, L, 2))
    data = {
        "keypoints0": jnp.asarray(rng.uniform(0, 256, (B, N, 2)), jnp.float32),
        "keypoints1": jnp.asarray(rng.uniform(0, 256, (B, N, 2)), jnp.float32),
        "descriptors0": jnp.asarray(rng.normal(size=(B, N, D)), jnp.float32),
        "descriptors1": jnp.asarray(rng.normal(size=(B, N, D)), jnp.float32),
        "keypoint_scores0": jnp.asarray(rng.uniform(0, 1, (B, N)), jnp.float32),
        "keypoint_scores1": jnp.asarray(rng.uniform(0, 1, (B, N)), jnp.float32),
        "lines0": jnp.asarray(rng.uniform(0, 256, (B, L, 2, 2)), jnp.float32),
        "lines1": jnp.asarray(rng.uniform(0, 256, (B, L, 2, 2)), jnp.float32),
        "lines_junc_idx0": jnp.asarray(junc_idx, jnp.int32),
        "lines_junc_idx1": jnp.asarray(junc_idx, jnp.int32),
        "line_scores0": jnp.asarray(rng.uniform(0, 1, (B, L)), jnp.float32),
        "line_scores1": jnp.asarray(rng.uniform(0, 1, (B, L)), jnp.float32),
        "keypoint_mask0": jnp.ones((B, N), bool),
        "keypoint_mask1": jnp.ones((B, N), bool),
        "line_mask0": jnp.ones((B, L), bool),
        "line_mask1": jnp.ones((B, L), bool),
        "view0": {"image_size": jnp.asarray([[256.0, 256.0]])},
        "view1": {"image_size": jnp.asarray([[256.0, 256.0]])},
        "gt_matches0": jnp.full((B, N), -1, jnp.int32),
        "gt_matches1": jnp.full((B, N), -1, jnp.int32),
        "gt_line_matches0": jnp.full((B, L), -1, jnp.int32),
        "gt_line_matches1": jnp.full((B, L), -1, jnp.int32),
        "gt_assignment": jnp.zeros((B, N, N), bool),
        "gt_line_assignment": jnp.zeros((B, L, L), bool),
    }
    variables = gs.init({"params": jax.random.key(0)}, data, method="initialize")

    def loss_fn(params):
        pred = gs.apply(
            {"params": params}, data, train=True, mutable=["batch_stats"]
        )[0]
        losses, _ = gs.apply(
            {"params": params}, pred, data, train=True, method="loss"
        )
        return losses["total"].mean()

    loss, grads = jax.value_and_grad(loss_fn)(variables["params"])
    assert np.isfinite(float(loss))
    gnorm = float(
        jnp.sqrt(sum(jnp.sum(jnp.square(g)) for g in jax.tree.leaves(grads)))
    )
    assert np.isfinite(gnorm) and gnorm > 0

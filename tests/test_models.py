import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gluefactory_tpu.geometry.homography import warp_points
from gluefactory_tpu.models import get_model
from gluefactory_tpu.models.matchers.lightglue import LightGlue, normalize_keypoints


def test_registry_resolves():
    assert get_model("superpoint").__name__ == "SuperPoint"
    assert get_model("lightglue").__name__ == "LightGlue"
    assert get_model("nearest_neighbor_matcher").__name__ == "NearestNeighborMatcher"
    assert get_model("two_view_pipeline").__name__ == "TwoViewPipeline"
    with pytest.raises(RuntimeError):
        get_model("no_such_model")


def test_conf_merging_inheritance():
    sp = get_model("superpoint")
    conf = sp.resolve_conf({"max_num_keypoints": 256})
    assert conf.max_num_keypoints == 256
    assert conf.nms_radius == 4  # own default
    assert conf.trainable is True  # base default
    with pytest.raises(KeyError):
        sp.resolve_conf({"nonexistent_key": 1})


def make_superpoint(k=64):
    sp = get_model("superpoint").from_conf(
        {"max_num_keypoints": k, "detection_threshold": 0.0005}
    )
    rng = jax.random.key(0)
    img = jax.random.uniform(jax.random.key(1), (2, 64, 64, 1))
    data = {"image": img}
    params = sp.init({"params": rng}, data)
    return sp, params, data


def test_superpoint_shapes():
    k = 64
    sp, params, data = make_superpoint(k)
    pred = sp.apply(params, data)
    assert pred["keypoints"].shape == (2, k, 2)
    assert pred["descriptors"].shape == (2, k, 256)
    assert pred["keypoint_scores"].shape == (2, k)
    assert pred["keypoint_mask"].shape == (2, k)
    # descriptors are unit norm
    np.testing.assert_allclose(
        np.linalg.norm(np.asarray(pred["descriptors"]), axis=-1), 1.0, atol=1e-3
    )
    # keypoints inside image
    kp = np.asarray(pred["keypoints"])
    assert (kp >= 0).all() and (kp <= 64).all()


def test_superpoint_jit_and_grad_safe():
    sp, params, data = make_superpoint(32)
    fn = jax.jit(lambda p, d: sp.apply(p, d))
    pred = fn(params, data)
    assert np.isfinite(np.asarray(pred["keypoint_scores"])).all()


def make_matcher_inputs(rng_seed=0, B=2, M=48, N=48, D=256, add_mask=True):
    rng = np.random.default_rng(rng_seed)
    data = {
        "keypoints0": jnp.asarray(rng.uniform(0, 512, (B, M, 2)), jnp.float32),
        "keypoints1": jnp.asarray(rng.uniform(0, 512, (B, N, 2)), jnp.float32),
        "descriptors0": jnp.asarray(rng.normal(size=(B, M, D)), jnp.float32),
        "descriptors1": jnp.asarray(rng.normal(size=(B, N, D)), jnp.float32),
        "view0": {"image_size": jnp.asarray([[512.0, 512.0]] * B)},
        "view1": {"image_size": jnp.asarray([[512.0, 512.0]] * B)},
    }
    if add_mask:
        m0 = np.ones((B, M), bool)
        m0[:, M - 8 :] = False
        m1 = np.ones((B, N), bool)
        m1[:, N - 4 :] = False
        data["keypoint_mask0"] = jnp.asarray(m0)
        data["keypoint_mask1"] = jnp.asarray(m1)
    return data


def test_lightglue_forward_shapes():
    lg = LightGlue.from_conf({"n_layers": 2, "checkpointed": False})
    data = make_matcher_inputs()
    params = lg.init({"params": jax.random.key(0)}, data)
    pred = lg.apply(params, data)
    B, M, N = 2, 48, 48
    assert pred["log_assignment"].shape == (B, M + 1, N + 1)
    assert pred["matches0"].shape == (B, M)
    assert pred["matching_scores0"].shape == (B, M)
    # masked keypoints never match
    m0 = np.asarray(pred["matches0"])
    assert (m0[:, M - 8 :] == -1).all()


def test_lightglue_identical_descriptors_match():
    """With identical descriptors+keypoints in both views, a trained-free
    LightGlue won't match confidently, but the assignment must be symmetric."""
    lg = LightGlue.from_conf({"n_layers": 2, "checkpointed": False, "filter_threshold": 0.0})
    data = make_matcher_inputs(add_mask=False)
    data["keypoints1"] = data["keypoints0"]
    data["descriptors1"] = data["descriptors0"]
    params = lg.init({"params": jax.random.key(0)}, data)
    pred = lg.apply(params, data)
    scores = np.asarray(pred["log_assignment"])
    # symmetric inputs -> symmetric inner assignment
    np.testing.assert_allclose(
        scores[:, :-1, :-1], np.swapaxes(scores[:, :-1, :-1], 1, 2), atol=1e-3
    )


@pytest.mark.slow
def test_lightglue_loss_and_grads():
    lg = LightGlue.from_conf({"n_layers": 2, "checkpointed": False})
    data = make_matcher_inputs(add_mask=False)
    B, M, N = 2, 48, 48
    rng = np.random.default_rng(1)
    gt_m0 = rng.integers(-1, N, size=(B, M))
    gt_ass = np.zeros((B, M, N), bool)
    for b in range(B):
        for i in range(M):
            if gt_m0[b, i] >= 0:
                gt_ass[b, i, gt_m0[b, i]] = True
    data["gt_matches0"] = jnp.asarray(gt_m0, jnp.int32)
    data["gt_matches1"] = jnp.full((B, N), -1, jnp.int32)
    data["gt_assignment"] = jnp.asarray(gt_ass)

    params = lg.init({"params": jax.random.key(0)}, data, method="initialize")

    def loss_fn(p):
        pred = lg.apply(p, data, train=True)
        losses, metrics = lg.apply(p, pred, data, method="loss")
        return losses["total"].mean()

    loss, grads = jax.value_and_grad(loss_fn)(params)
    assert np.isfinite(float(loss))
    flat = jax.tree.leaves(grads)
    assert all(np.isfinite(np.asarray(g)).all() for g in flat)
    # some gradient must reach the first transformer layer
    gnorm = sum(float(jnp.abs(g).sum()) for g in flat)
    assert gnorm > 0


def _cast_f32_to_bf16(tree):
    return jax.tree.map(
        lambda x: x.astype(jnp.bfloat16)
        if isinstance(x, jnp.ndarray) and x.dtype == jnp.float32
        else x,
        tree,
    )


@pytest.mark.slow
def test_matcher_trunks_stay_bf16():
    """Regression for the f32-upcast leak class (ROADMAP round-4 perf log):
    f32 keypoints/scores/posenc entering a bf16 matcher must not promote the
    trunk back to f32 — one stray f32 operand in an add poisons every
    downstream layer."""
    # LightGlue: train-mode stacked per-layer descriptors expose trunk dtype
    lg = LightGlue.from_conf({"n_layers": 2, "checkpointed": False})
    data = make_matcher_inputs()
    params = lg.init({"params": jax.random.key(0)}, data)
    data16 = dict(data)
    for k in ("descriptors0", "descriptors1"):
        data16[k] = data[k].astype(jnp.bfloat16)
    pred = lg.apply(_cast_f32_to_bf16(params), data16, train=True)
    assert pred["ref_descriptors0"].dtype == jnp.bfloat16

    # SuperGlue: capture final_proj's output (the full-GNN result)
    sg = get_model("superglue").from_conf({"n_layers": 2, "checkpointed": False})
    data16["keypoint_scores0"] = jnp.ones(data["keypoints0"].shape[:2])
    data16["keypoint_scores1"] = jnp.ones(data["keypoints1"].shape[:2])
    sgvars = sg.init({"params": jax.random.key(1)}, data16)
    _, state = sg.apply(
        _cast_f32_to_bf16(sgvars),
        data16,
        capture_intermediates=lambda mdl, _: mdl.name == "final_proj",
    )
    leaves = jax.tree.leaves(state["intermediates"])
    assert leaves and all(l.dtype == jnp.bfloat16 for l in leaves)


def test_gluestick_trunk_stays_bf16():
    """Same leak class via the keypoint AND line-endpoint encoders."""
    B, N, L, D = 1, 40, 8, 64
    rng = np.random.default_rng(2)
    gs = get_model("gluestick").from_conf(
        {"n_layers": 2, "descriptor_dim": D, "input_dim": D, "num_heads": 2}
    )
    junc_idx = rng.integers(0, 16, (B, L, 2))
    data = {
        "keypoints0": jnp.asarray(rng.uniform(0, 512, (B, N, 2)), jnp.float32),
        "keypoints1": jnp.asarray(rng.uniform(0, 512, (B, N, 2)), jnp.float32),
        "descriptors0": jnp.asarray(rng.normal(size=(B, N, D)), jnp.bfloat16),
        "descriptors1": jnp.asarray(rng.normal(size=(B, N, D)), jnp.bfloat16),
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
    }
    variables = gs.init({"params": jax.random.key(0)}, data, method="initialize")
    _, state = gs.apply(
        _cast_f32_to_bf16(variables),
        data,
        capture_intermediates=lambda mdl, _: mdl.name == "final_proj",
    )
    leaves = jax.tree.leaves(state["intermediates"])
    assert leaves and all(l.dtype == jnp.bfloat16 for l in leaves)


def test_normalize_keypoints():
    kpts = jnp.asarray([[[0.0, 0.0], [640.0, 480.0], [320.0, 240.0]]])
    size = jnp.asarray([[640.0, 480.0]])
    out = np.asarray(normalize_keypoints(kpts, size))
    np.testing.assert_allclose(out[0, 2], [0.0, 0.0], atol=1e-6)
    np.testing.assert_allclose(out[0, 1], [1.0, 0.75], atol=1e-6)


def test_two_view_pipeline_with_nn_matcher():
    pipeline = get_model("two_view_pipeline").from_conf(
        {
            "extractor": {
                "name": "superpoint",
                "max_num_keypoints": 32,
                "detection_threshold": 0.0005,
            },
            "matcher": {"name": "nearest_neighbor_matcher"},
        }
    )
    img0 = jax.random.uniform(jax.random.key(3), (1, 64, 64, 1))
    data = {
        "view0": {"image": img0, "image_size": jnp.asarray([[64.0, 64.0]])},
        "view1": {"image": img0, "image_size": jnp.asarray([[64.0, 64.0]])},
    }
    params = pipeline.init({"params": jax.random.key(0)}, data)
    pred = pipeline.apply(params, data)
    assert "keypoints0" in pred and "matches0" in pred
    # same image on both sides: every valid keypoint matches itself
    m0 = np.asarray(pred["matches0"])[0]
    valid = np.asarray(pred["keypoint_mask0"])[0]
    np.testing.assert_array_equal(m0[valid], np.arange(32)[valid])


def test_homography_matcher_in_pipeline_loss():
    pipeline = get_model("two_view_pipeline").from_conf(
        {
            "matcher": {"name": "lightglue", "n_layers": 2, "checkpointed": False},
            "ground_truth": {"name": "homography_matcher", "th_positive": 3.0},
        }
    )
    data = make_matcher_inputs(add_mask=False)
    H = jnp.asarray([[[1.0, 0.0, 4.0], [0.0, 1.0, -2.0], [0.0, 0.0, 1.0]]] * 2)
    data["keypoints1"] = warp_points(data["keypoints0"], H)
    data["descriptors1"] = data["descriptors0"]
    data["H_0to1"] = H
    data["view0"] = {"image_size": jnp.asarray([[512.0, 512.0]] * 2)}
    data["view1"] = {"image_size": jnp.asarray([[512.0, 512.0]] * 2)}
    params = pipeline.init({"params": jax.random.key(0)}, data, method="initialize")
    pred = pipeline.apply(params, data, train=True)
    losses, metrics = pipeline.apply(params, pred, data, method="loss")
    assert losses["total"].shape == (2,)
    assert np.isfinite(np.asarray(losses["total"])).all()
    assert "match_recall" in metrics


def test_imcui_pred_conversion():
    """IMCUI aligned-match-list conversion (reference imcui.py:100-122):
    top-k by confidence, identity matches, batch dim added."""
    import numpy as np

    from gluefactory_tpu.models.matchers.imcui import convert_imcui_pred

    rng = np.random.default_rng(0)
    n = 20
    pred = {
        "mkeypoints0_orig": rng.uniform(0, 100, (n, 2)),
        "mkeypoints1_orig": rng.uniform(0, 100, (n, 2)),
        "mconf": rng.uniform(0, 1, n),
    }
    out = convert_imcui_pred(pred)
    assert out["keypoints0"].shape == (1, n, 2)
    assert (out["matches0"][0] == np.arange(n)).all()
    np.testing.assert_allclose(out["matching_scores0"][0], pred["mconf"], atol=1e-6)

    out8 = convert_imcui_pred(pred, max_num_matches=8)
    assert out8["keypoints0"].shape == (1, 8, 2)
    kept = set(np.round(out8["matching_scores0"][0].astype(np.float32), 5))
    top8 = set(np.round(np.sort(pred["mconf"].astype(np.float32))[-8:], 5))
    assert kept == top8


def test_superpoint_val_k_randomize_and_refinement():
    """Reference-parity knobs: max_num_keypoints_val (superpoint.py:162),
    randomize_keypoints_training (:90-94), refinement_radius (:97-113)."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from gluefactory_tpu.models.extractors.superpoint import SuperPoint

    rng = np.random.default_rng(0)
    img = jnp.asarray(rng.uniform(0, 1, (1, 64, 64, 1)), jnp.float32)
    sp = SuperPoint.from_conf(
        {
            "max_num_keypoints": 32,
            "max_num_keypoints_val": 12,
            "detection_threshold": 0.0,
            "randomize_keypoints_training": True,
        }
    )
    variables = sp.init(
        {"params": jax.random.key(0), "sample": jax.random.key(1)}, {"image": img}
    )
    # eval: K_val applies
    out_eval = sp.apply(variables, {"image": img})
    assert out_eval["keypoints"].shape == (1, 12, 2)

    # train: randomized sampling, K_train applies, draws differ across rngs
    out_a = sp.apply(
        variables, {"image": img}, train=True, rngs={"sample": jax.random.key(2)},
        method="_forward",
    )
    out_b = sp.apply(
        variables, {"image": img}, train=True, rngs={"sample": jax.random.key(3)},
        method="_forward",
    )
    assert out_a["keypoints"].shape == (1, 32, 2)
    assert not np.allclose(np.asarray(out_a["keypoints"]), np.asarray(out_b["keypoints"]))
    # sampled points are genuine positive-score detections
    assert (np.asarray(out_a["keypoint_scores"])[np.asarray(out_a["keypoint_mask"])] > 0).all()

    # refinement: keypoints move sub-pixel but stay within the radius
    sp_ref = SuperPoint.from_conf(
        {"max_num_keypoints": 16, "detection_threshold": 0.0, "refinement_radius": 2}
    )
    sp_base = SuperPoint.from_conf(
        {"max_num_keypoints": 16, "detection_threshold": 0.0}
    )
    out_r = sp_ref.apply(variables, {"image": img})
    out_0 = sp_base.apply(variables, {"image": img})
    d = np.abs(np.asarray(out_r["keypoints"]) - np.asarray(out_0["keypoints"]))
    assert d.max() <= 2.0 + 1e-5
    assert d.max() > 0.0  # refinement actually moves something

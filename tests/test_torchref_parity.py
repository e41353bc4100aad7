"""NON-CIRCULAR converter parity: the EXECUTING torch reference
(/root/reference, run on CPU with randomly initialized official-layout
weights) vs our converted flax forward on identical inputs.

Unlike tests/test_compat.py (numpy re-derivations of the official layer
semantics), the reference side here is the actual reference code — a
misreading of the official semantics cannot pass both sides.

Reference entry points exercised:
  - gluefactory_nonfree/superpoint.py:202-348 (dense heads + sparse decode)
  - gluefactory/models/matchers/lightglue.py:412-530
  - gluefactory_nonfree/superglue.py:255-320
  - gluefactory/models/matchers/gluestick.py:143-376
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

torch = pytest.importorskip("torch")

pytestmark = pytest.mark.torchref

from torchref import load_reference  # noqa: E402

load_reference()

from gluefactory_tpu.compat.torch_conversion import (  # noqa: E402
    convert_gluestick,
    convert_lightglue,
    convert_superglue,
    convert_superpoint,
)


def _np(x):
    return x.detach().cpu().numpy() if isinstance(x, torch.Tensor) else np.asarray(x)


def _sd(model):
    return {k: v.detach().cpu().numpy() for k, v in model.state_dict().items()}


# ---------------------------------------------------------------------------
# SuperPoint
# ---------------------------------------------------------------------------


def test_superpoint_forward_parity():
    from gluefactory_nonfree.superpoint import SuperPoint as RefSuperPoint

    from gluefactory_tpu.models.extractors.superpoint import SuperPoint

    torch.manual_seed(0)
    K = 64
    ref = RefSuperPoint(
        {
            "max_num_keypoints": K,
            "detection_threshold": 0.0,
            "nms_radius": 4,
            "remove_borders": 4,
            "legacy_sampling": False,
            "dense_outputs": True,
        }
    )
    ref.eval()
    rng = np.random.default_rng(0)
    img = rng.uniform(0, 1, (1, 96, 128, 1)).astype(np.float32)
    with torch.no_grad():
        ref_out = ref({"image": torch.from_numpy(img.transpose(0, 3, 1, 2))})

    params = convert_superpoint(_sd(ref))
    sp = SuperPoint.from_conf(
        {
            "max_num_keypoints": K,
            "detection_threshold": 0.0,
            "nms_radius": 4,
            "remove_borders": 4,
            "dense_outputs": True,
        }
    )
    out = sp.apply({"params": params}, {"image": jnp.asarray(img)})

    # dense heads: converter correctness independent of decode logic
    np.testing.assert_allclose(
        np.asarray(out["dense_descriptors"])[0],
        _np(ref_out["dense_descriptors"])[0].transpose(1, 2, 0),
        atol=1e-5,
    )

    # sparse decode: same top-K keypoints, scores, descriptors
    mask = np.asarray(out["keypoint_mask"])[0]
    assert mask.all(), "expected a full top-K at threshold 0"
    kpts = np.asarray(out["keypoints"])[0]
    scores = np.asarray(out["keypoint_scores"])[0]
    desc = np.asarray(out["descriptors"])[0]
    ref_kpts = _np(ref_out["keypoints"])[0]
    ref_scores = _np(ref_out["keypoint_scores"])[0]
    ref_desc = _np(ref_out["descriptors"])[0]

    # canonical order: by position (keypoints are grid coords, exactly equal
    # across implementations; score-primary ordering is unstable under fp
    # jitter when two detections tie)
    def order(k):
        return np.lexsort((k[:, 0], k[:, 1]))

    oi, oj = order(kpts), order(ref_kpts)
    np.testing.assert_allclose(kpts[oi], ref_kpts[oj], atol=1e-4)
    np.testing.assert_allclose(scores[oi], ref_scores[oj], atol=1e-5)
    np.testing.assert_allclose(desc[oi], ref_desc[oj], atol=5e-4)


# ---------------------------------------------------------------------------
# LightGlue
# ---------------------------------------------------------------------------


def _lg_inputs(rng, n0, n1, dim, w=128.0, h=96.0):
    return {
        "keypoints0": rng.uniform(5, min(w, h) - 5, (1, n0, 2)).astype(np.float32),
        "keypoints1": rng.uniform(5, min(w, h) - 5, (1, n1, 2)).astype(np.float32),
        "descriptors0": rng.normal(size=(1, n0, dim)).astype(np.float32),
        "descriptors1": rng.normal(size=(1, n1, dim)).astype(np.float32),
        "image_size": np.asarray([[w, h]], np.float32),
    }


def _to_torch_view(d):
    return {
        "keypoints0": torch.from_numpy(d["keypoints0"]),
        "keypoints1": torch.from_numpy(d["keypoints1"]),
        "descriptors0": torch.from_numpy(d["descriptors0"]),
        "descriptors1": torch.from_numpy(d["descriptors1"]),
        "view0": {"image_size": torch.from_numpy(d["image_size"])},
        "view1": {"image_size": torch.from_numpy(d["image_size"])},
    }


def _to_jax_view(d):
    return {
        "keypoints0": jnp.asarray(d["keypoints0"]),
        "keypoints1": jnp.asarray(d["keypoints1"]),
        "descriptors0": jnp.asarray(d["descriptors0"]),
        "descriptors1": jnp.asarray(d["descriptors1"]),
        "view0": {"image_size": jnp.asarray(d["image_size"])},
        "view1": {"image_size": jnp.asarray(d["image_size"])},
    }


def test_lightglue_forward_parity():
    from gluefactory.models.matchers.lightglue import LightGlue as RefLightGlue

    from gluefactory_tpu.models.matchers.lightglue import LightGlue

    dim, heads, n_layers = 64, 2, 2
    torch.manual_seed(1)
    ref = RefLightGlue(
        {
            "features": None,
            "input_dim": dim,
            "descriptor_dim": dim,
            "n_layers": n_layers,
            "num_heads": heads,
            "flash": False,
            "depth_confidence": -1,
            "width_confidence": -1,
            "weights": None,
            "filter_threshold": 0.1,
        }
    )
    ref.eval()
    rng = np.random.default_rng(1)
    data = _lg_inputs(rng, 48, 56, dim)
    with torch.no_grad():
        ref_out = ref(_to_torch_view(data))

    params = convert_lightglue(_sd(ref), n_layers=n_layers, dim=dim, num_heads=heads)
    lg = LightGlue.from_conf(
        {
            "input_dim": dim,
            "descriptor_dim": dim,
            "n_layers": n_layers,
            "num_heads": heads,
            "checkpointed": False,
            "filter_threshold": 0.1,
        }
    )
    out = lg.apply({"params": params}, _to_jax_view(data))

    la = np.array(np.asarray(out["log_assignment"])[0, :49, :57])
    ref_la = _np(ref_out["log_assignment"])[0].copy()
    # the dustbin-dustbin corner carries no probability mass and is never
    # read (reference leaves it at 0; we fill the masked value) — exclude it
    la[-1, -1] = ref_la[-1, -1] = 0.0
    np.testing.assert_allclose(la, ref_la, atol=1e-4)
    assert (np.asarray(out["matches0"])[0, :48] == _np(ref_out["matches0"])[0]).all()
    assert (np.asarray(out["matches1"])[0, :56] == _np(ref_out["matches1"])[0]).all()
    np.testing.assert_allclose(
        np.asarray(out["matching_scores0"])[0, :48],
        _np(ref_out["matching_scores0"])[0],
        atol=1e-4,
    )


def _make_ref_lightglue(dim, heads, n_layers, depth_conf, width_conf, seed=1):
    from gluefactory.models.matchers.lightglue import LightGlue as RefLightGlue

    torch.manual_seed(seed)
    ref = RefLightGlue(
        {
            "features": None,
            "input_dim": dim,
            "descriptor_dim": dim,
            "n_layers": n_layers,
            "num_heads": heads,
            "flash": False,
            "depth_confidence": depth_conf,
            "width_confidence": width_conf,
            "weights": None,
            "filter_threshold": 0.1,
        }
    )
    ref.eval()
    return ref


def _my_lightglue(dim, heads, n_layers, depth_conf, width_conf):
    from gluefactory_tpu.models.matchers.lightglue import LightGlue

    return LightGlue.from_conf(
        {
            "input_dim": dim,
            "descriptor_dim": dim,
            "n_layers": n_layers,
            "num_heads": heads,
            "checkpointed": False,
            "filter_threshold": 0.1,
            "depth_confidence": depth_conf,
            "width_confidence": width_conf,
        }
    )


def test_lightglue_pruned_parity_depth_exit():
    """Depth pruning, biased-confident weights: the reference exits at the
    first confidence check (layer 0); the masked static-shape realization
    must produce identical matches, scores, and prune counters
    (reference lightglue.py:489-526)."""
    dim, heads, n_layers = 64, 2, 3
    ref = _make_ref_lightglue(dim, heads, n_layers, 0.95, 0.95, seed=7)
    with torch.no_grad():  # all tokens confident -> immediate depth exit
        for tc in ref.token_confidence:
            tc.token[0].bias.fill_(10.0)
            tc.token[0].weight.fill_(0.0)
    rng = np.random.default_rng(7)
    data = _lg_inputs(rng, 32, 40, dim)
    # upstream bug: on depth exit before the last layer, eval-mode all_desc0
    # is empty and `torch.stack` raises (lightglue.py:484,536); tolerate it
    # so the comparable outputs (matches/scores/prune) are still produced
    orig_stack = torch.stack

    def safe_stack(ts, dim=0, **kw):
        if isinstance(ts, (list, tuple)) and len(ts) == 0:
            return torch.zeros(0)
        return orig_stack(ts, dim, **kw)

    torch.stack = safe_stack
    try:
        with torch.no_grad():
            ref_out = ref(_to_torch_view(data))
    finally:
        torch.stack = orig_stack

    params = convert_lightglue(_sd(ref), n_layers=n_layers, dim=dim, num_heads=heads)
    lg = _my_lightglue(dim, heads, n_layers, 0.95, 0.95)
    out = lg.apply({"params": params}, _to_jax_view(data))

    assert (np.asarray(out["matches0"])[0] == _np(ref_out["matches0"])[0]).all()
    assert (np.asarray(out["matches1"])[0] == _np(ref_out["matches1"])[0]).all()
    np.testing.assert_allclose(
        np.asarray(out["matching_scores0"])[0],
        _np(ref_out["matching_scores0"])[0],
        atol=1e-4,
    )
    assert (np.asarray(out["prune0"])[0] == _np(ref_out["prune0"])[0]).all()
    assert (np.asarray(out["prune1"])[0] == _np(ref_out["prune1"])[0]).all()


def test_lightglue_pruned_parity_width_pruning():
    """Width pruning with unbiased weights (random matchabilities ~0.5 and a
    high keep-threshold prune many tokens; depth exit never fires): pruned
    indices, matches, and prune counters must match the reference's
    gather-based realization exactly."""
    dim, heads, n_layers = 64, 2, 3
    # width-only (depth off -> reference keeps token0=None and the keep rule
    # is matchability-only); width_confidence=0.4 -> keep needs
    # sigmoid(z) > 0.6, which prunes roughly half the random tokens
    ref = _make_ref_lightglue(dim, heads, n_layers, -1, 0.4, seed=8)
    with torch.no_grad():  # spread matchability logits so ~half survive
        for la in ref.log_assignment:
            la.matchability.weight.mul_(25.0)
    rng = np.random.default_rng(8)
    data = _lg_inputs(rng, 36, 30, dim)
    with torch.no_grad():
        ref_out = ref(_to_torch_view(data))

    params = convert_lightglue(_sd(ref), n_layers=n_layers, dim=dim, num_heads=heads)
    lg = _my_lightglue(dim, heads, n_layers, -1, 0.4)
    out = lg.apply({"params": params}, _to_jax_view(data))

    ref_prune0 = _np(ref_out["prune0"])[0]
    assert (np.asarray(out["prune0"])[0] == ref_prune0).all()
    assert (np.asarray(out["prune1"])[0] == _np(ref_out["prune1"])[0]).all()
    assert (ref_prune0 < n_layers).any(), "test vacuous: nothing was pruned"
    assert (np.asarray(out["matches0"])[0] == _np(ref_out["matches0"])[0]).all()
    np.testing.assert_allclose(
        np.asarray(out["matching_scores0"])[0],
        _np(ref_out["matching_scores0"])[0],
        atol=2e-4,
    )


def test_lightglue_pruned_equals_unpruned_when_thresholds_never_fire():
    """With thresholds that can never trigger (depth ratio > 1 impossible,
    width keep-threshold ~0), the pruned code path must reduce exactly to
    the unpruned forward."""
    dim, heads, n_layers = 64, 2, 2
    ref = _make_ref_lightglue(dim, heads, n_layers, -1, -1, seed=9)
    params = convert_lightglue(_sd(ref), n_layers=n_layers, dim=dim, num_heads=heads)
    rng = np.random.default_rng(9)
    data = _lg_inputs(rng, 28, 28, dim)
    jdata = _to_jax_view(data)
    base = _my_lightglue(dim, heads, n_layers, -1, -1).apply({"params": params}, jdata)
    pruned = _my_lightglue(dim, heads, n_layers, 1.5, 1e-9).apply(
        {"params": params}, jdata
    )
    assert (np.asarray(pruned["matches0"]) == np.asarray(base["matches0"])).all()
    np.testing.assert_allclose(
        np.asarray(pruned["matching_scores0"]),
        np.asarray(base["matching_scores0"]),
        atol=1e-5,
    )


# ---------------------------------------------------------------------------
# SuperGlue
# ---------------------------------------------------------------------------


def test_superglue_forward_parity():
    from gluefactory_nonfree.superglue import SuperGlue as RefSuperGlue

    from gluefactory_tpu.models.matchers.superglue import SuperGlue

    n_layers, dim = 2, 256
    torch.manual_seed(2)
    ref = RefSuperGlue(
        {
            "weights": None,
            "descriptor_dim": dim,
            "GNN_layers": ["self", "cross"] * n_layers,
            "num_sinkhorn_iterations": 20,
            "filter_threshold": 0.2,
        }
    )
    ref.eval()
    rng = np.random.default_rng(2)
    data = _lg_inputs(rng, 40, 44, dim)
    tdata = _to_torch_view(data)
    # reference normalize_keypoints reads view["image"].shape eagerly even
    # when image_size is given (superglue.py:280)
    tdata["view0"]["image"] = torch.zeros(1, 1, 96, 128)
    tdata["view1"]["image"] = torch.zeros(1, 1, 96, 128)
    tdata["keypoint_scores0"] = torch.rand(1, 40)
    tdata["keypoint_scores1"] = torch.rand(1, 44)
    with torch.no_grad():
        ref_out = ref(tdata)

    params, stats = convert_superglue(_sd(ref), n_layers=n_layers, dim=dim, num_heads=4)
    sg = SuperGlue.from_conf(
        {
            "descriptor_dim": dim,
            "n_layers": n_layers,
            "sinkhorn_iterations": 20,
            "filter_threshold": 0.2,
            "checkpointed": False,
        }
    )
    jdata = _to_jax_view(data)
    jdata["keypoint_scores0"] = jnp.asarray(tdata["keypoint_scores0"].numpy())
    jdata["keypoint_scores1"] = jnp.asarray(tdata["keypoint_scores1"].numpy())
    out = sg.apply({"params": params, "batch_stats": stats}, jdata)

    np.testing.assert_allclose(
        np.asarray(out["log_assignment"])[0, :41, :45],
        _np(ref_out["log_assignment"])[0],
        atol=2e-4,
    )
    assert (np.asarray(out["matches0"])[0, :40] == _np(ref_out["matches0"])[0]).all()
    np.testing.assert_allclose(
        np.asarray(out["matching_scores0"])[0, :40],
        _np(ref_out["matching_scores0"])[0],
        atol=2e-4,
    )


# ---------------------------------------------------------------------------
# ALIKED
# ---------------------------------------------------------------------------


def test_aliked_forward_parity():
    """Reference ALIKED (torch, with the documented deform_conv2d shim) vs
    the converted flax model: dense maps, keypoints, and descriptors
    (reference aliked.py:591-788)."""
    from gluefactory.models.extractors.aliked import ALIKED as RefALIKED

    from gluefactory_tpu.compat.torch_conversion import convert_aliked
    from gluefactory_tpu.models.extractors.aliked import ALIKED

    torch.manual_seed(4)
    K = 48
    ref = RefALIKED(
        {
            "model_name": "aliked-t16",
            "max_num_keypoints": K,
            "detection_threshold": 0.0,
            "force_num_keypoints": False,
            "pretrained": False,
            "nms_radius": 2,
        }
    )
    ref.eval()
    rng = np.random.default_rng(4)
    img = rng.uniform(0, 1, (1, 64, 96, 3)).astype(np.float32)
    with torch.no_grad():
        ref_out = ref({"image": torch.from_numpy(img.transpose(0, 3, 1, 2))})

    params, stats = convert_aliked(_sd(ref), "aliked-t16")
    al = ALIKED.from_conf(
        {
            "model_name": "aliked-t16",
            "max_num_keypoints": K,
            "detection_threshold": 0.0,
            "nms_radius": 2,
        }
    )
    variables = {"params": params, "batch_stats": stats}
    # structural check: converted tree must match init exactly
    init_vars = al.init(
        {"params": jax.random.key(0), "sample": jax.random.key(1)},
        {"image": jnp.asarray(img)},
    )

    def paths(tree):
        return {
            tuple(str(k) for k in p): np.asarray(v).shape
            for p, v in jax.tree_util.tree_flatten_with_path(tree)[0]
        }

    assert paths(params) == paths(init_vars["params"])
    out = al.apply(variables, {"image": jnp.asarray(img)})

    # dense parity (converter correctness)
    fmap, smap = al.apply(
        variables, jnp.asarray(img), method="extract_dense_map"
    )
    ref_smap = _np(ref_out["score_map"])[0, 0]
    np.testing.assert_allclose(np.asarray(smap)[0], ref_smap, atol=1e-4)

    # sparse decode: same keypoints (reference emits array-index coords =
    # ours - 0.5), scores, and descriptors
    h, w = 64, 96
    ref_kpts_idx = (_np(ref_out["keypoints"])[0])  # index coords
    my_kpts_idx = np.asarray(out["keypoints"])[0] - 0.5
    mask = np.asarray(out["keypoint_mask"])[0]
    assert mask.all()

    def order(k):
        return np.lexsort((np.round(k[:, 0], 3), np.round(k[:, 1], 3)))

    oi, oj = order(my_kpts_idx), order(ref_kpts_idx)
    np.testing.assert_allclose(my_kpts_idx[oi], ref_kpts_idx[oj], atol=1e-3)
    np.testing.assert_allclose(
        np.asarray(out["keypoint_scores"])[0][oi],
        _np(ref_out["keypoint_scores"])[0][oj],
        atol=1e-4,
    )
    np.testing.assert_allclose(
        np.asarray(out["descriptors"])[0][oi],
        _np(ref_out["descriptors"])[0][oj],
        atol=2e-3,
    )


# ---------------------------------------------------------------------------
# GlueStick
# ---------------------------------------------------------------------------


def test_gluestick_forward_parity():
    from gluefactory.models.matchers.gluestick import GlueStick as RefGlueStick

    from gluefactory_tpu.models.matchers.gluestick import GlueStick

    # NB: the reference GNNLayer hard-codes 4 heads (gluestick.py:570) — the
    # conf has no head count, so parity requires num_heads=4 on our side
    n_layers, dim, heads = 2, 64, 4
    torch.manual_seed(3)
    ref = RefGlueStick(
        {
            "input_dim": dim,
            "descriptor_dim": dim,
            "weights": None,
            "GNN_layers": ["self", "cross"] * n_layers,
            "num_line_iterations": 1,
            "line_attention": False,
            "filter_threshold": 0.2,
        }
    )
    ref.eval()
    rng = np.random.default_rng(3)
    N, L = 40, 8
    data = _lg_inputs(rng, N, N, dim, w=512.0, h=512.0)
    junc0 = rng.integers(0, 16, (1, L, 2)).astype(np.int64)
    junc1 = rng.integers(0, 16, (1, L, 2)).astype(np.int64)
    lines0 = rng.uniform(0, 512, (1, L, 2, 2)).astype(np.float32)
    lines1 = rng.uniform(0, 512, (1, L, 2, 2)).astype(np.float32)
    lsc0 = rng.uniform(0.1, 1, (1, L)).astype(np.float32)
    lsc1 = rng.uniform(0.1, 1, (1, L)).astype(np.float32)
    ksc0 = rng.uniform(0, 1, (1, N)).astype(np.float32)
    ksc1 = rng.uniform(0, 1, (1, N)).astype(np.float32)

    tdata = _to_torch_view(data)
    tdata.update(
        {
            "keypoint_scores0": torch.from_numpy(ksc0),
            "keypoint_scores1": torch.from_numpy(ksc1),
            "lines0": torch.from_numpy(lines0),
            "lines1": torch.from_numpy(lines1),
            "lines_junc_idx0": torch.from_numpy(junc0),
            "lines_junc_idx1": torch.from_numpy(junc1),
            "line_scores0": torch.from_numpy(lsc0),
            "line_scores1": torch.from_numpy(lsc1),
        }
    )
    with torch.no_grad():
        ref_out = ref(tdata)

    params, stats = convert_gluestick(_sd(ref), n_layers=n_layers, dim=dim, num_heads=heads)
    gs = GlueStick.from_conf(
        {
            "input_dim": dim,
            "descriptor_dim": dim,
            "n_layers": n_layers,
            "num_heads": heads,
            "num_line_iterations": 1,
            "line_attention": False,
            "filter_threshold": 0.2,
            "checkpointed": False,
        }
    )
    jdata = _to_jax_view(data)
    jdata.update(
        {
            "keypoint_scores0": jnp.asarray(ksc0),
            "keypoint_scores1": jnp.asarray(ksc1),
            "lines0": jnp.asarray(lines0),
            "lines1": jnp.asarray(lines1),
            "lines_junc_idx0": jnp.asarray(junc0, jnp.int32),
            "lines_junc_idx1": jnp.asarray(junc1, jnp.int32),
            "line_scores0": jnp.asarray(lsc0),
            "line_scores1": jnp.asarray(lsc1),
        }
    )
    variables = {"params": params}
    if stats:
        variables["batch_stats"] = stats
    out = gs.apply(variables, jdata)

    for mine_key, ref_key in (
        ("log_assignment", "log_assignment"),
        ("line_log_assignment", "line_log_assignment"),
    ):
        a = np.array(np.asarray(out[mine_key])[0])
        b = _np(ref_out[ref_key])[0].copy()
        a = a[: b.shape[0], : b.shape[1]]
        a[-1, -1] = b[-1, -1] = 0.0  # unread dustbin-dustbin corner
        np.testing.assert_allclose(a, b, atol=2e-4, err_msg=mine_key)
    assert (np.asarray(out["matches0"])[0, :N] == _np(ref_out["matches0"])[0]).all()
    assert (
        np.asarray(out["line_matches0"])[0, :L] == _np(ref_out["line_matches0"])[0]
    ).all()


# ---------------------------------------------------------------------------
# DINOv2 (vs the executing HuggingFace Dinov2Model — the official torch-hub
# layout is the same network; convert_dinov2 accepts both layouts)
# ---------------------------------------------------------------------------


def test_dinov2_parity_hf():
    transformers = pytest.importorskip("transformers")
    from transformers import Dinov2Config, Dinov2Model

    from gluefactory_tpu.compat.torch_conversion import convert_dinov2
    from gluefactory_tpu.models.backbones.dinov2 import DinoV2

    torch.manual_seed(0)
    cfg = Dinov2Config(
        hidden_size=64,
        num_hidden_layers=3,
        num_attention_heads=4,
        mlp_ratio=4,
        image_size=28,
        patch_size=14,
        layerscale_value=0.1,
        hidden_act="gelu",
        attn_implementation="eager",
    )
    ref = Dinov2Model(cfg).eval()
    img = (
        np.random.default_rng(0).uniform(0, 1, (2, 28, 28, 3)).astype(np.float32)
    )
    with torch.no_grad():
        ref_out = ref(torch.from_numpy(img.transpose(0, 3, 1, 2)))
    last = _np(ref_out.last_hidden_state)

    params = convert_dinov2(_sd(ref))
    model = DinoV2.from_conf(
        {
            "weights": "dinov2_vits14",
            "embed_dim": 64,
            "depth": 3,
            "num_heads": 4,
            "img_size": 28,
        }
    )
    out = model.apply({"params": params}, {"image": jnp.asarray(img)})
    np.testing.assert_allclose(
        np.asarray(out["global_descriptor"]), last[:, 0], atol=2e-5
    )
    np.testing.assert_allclose(
        np.asarray(out["descriptors"]), last[:, 1:], atol=2e-5
    )
    feats = np.asarray(out["features"])
    assert feats.shape == (2, 2, 2, 64)
    np.testing.assert_allclose(
        feats.reshape(2, 4, 64), last[:, 1:], atol=2e-5
    )


def test_dinov2_official_layout_roundtrip():
    """The official torch-hub key layout (blocks.{i}.attn.qkv / ls1.gamma)
    converts to the same params as the HF layout for the same weights."""
    from transformers import Dinov2Config, Dinov2Model

    from gluefactory_tpu.compat.torch_conversion import convert_dinov2

    torch.manual_seed(1)
    cfg = Dinov2Config(
        hidden_size=32,
        num_hidden_layers=2,
        num_attention_heads=2,
        mlp_ratio=4,
        image_size=28,
        patch_size=14,
        layerscale_value=0.1,
        attn_implementation="eager",
    )
    ref = Dinov2Model(cfg).eval()
    hf_sd = _sd(ref)
    # re-express the same weights in the official torch-hub layout
    official = {
        "cls_token": hf_sd["embeddings.cls_token"],
        "pos_embed": hf_sd["embeddings.position_embeddings"],
        "patch_embed.proj.weight": hf_sd[
            "embeddings.patch_embeddings.projection.weight"
        ],
        "patch_embed.proj.bias": hf_sd[
            "embeddings.patch_embeddings.projection.bias"
        ],
        "norm.weight": hf_sd["layernorm.weight"],
        "norm.bias": hf_sd["layernorm.bias"],
    }
    for i in range(2):
        h = f"encoder.layer.{i}"
        o = f"blocks.{i}"
        official[f"{o}.norm1.weight"] = hf_sd[f"{h}.norm1.weight"]
        official[f"{o}.norm1.bias"] = hf_sd[f"{h}.norm1.bias"]
        official[f"{o}.attn.qkv.weight"] = np.concatenate(
            [
                hf_sd[f"{h}.attention.attention.query.weight"],
                hf_sd[f"{h}.attention.attention.key.weight"],
                hf_sd[f"{h}.attention.attention.value.weight"],
            ],
            axis=0,
        )
        official[f"{o}.attn.qkv.bias"] = np.concatenate(
            [
                hf_sd[f"{h}.attention.attention.query.bias"],
                hf_sd[f"{h}.attention.attention.key.bias"],
                hf_sd[f"{h}.attention.attention.value.bias"],
            ]
        )
        official[f"{o}.attn.proj.weight"] = hf_sd[
            f"{h}.attention.output.dense.weight"
        ]
        official[f"{o}.attn.proj.bias"] = hf_sd[
            f"{h}.attention.output.dense.bias"
        ]
        official[f"{o}.ls1.gamma"] = hf_sd[f"{h}.layer_scale1.lambda1"]
        official[f"{o}.norm2.weight"] = hf_sd[f"{h}.norm2.weight"]
        official[f"{o}.norm2.bias"] = hf_sd[f"{h}.norm2.bias"]
        official[f"{o}.mlp.fc1.weight"] = hf_sd[f"{h}.mlp.fc1.weight"]
        official[f"{o}.mlp.fc1.bias"] = hf_sd[f"{h}.mlp.fc1.bias"]
        official[f"{o}.mlp.fc2.weight"] = hf_sd[f"{h}.mlp.fc2.weight"]
        official[f"{o}.mlp.fc2.bias"] = hf_sd[f"{h}.mlp.fc2.bias"]
        official[f"{o}.ls2.gamma"] = hf_sd[f"{h}.layer_scale2.lambda1"]

    p_hf = convert_dinov2(hf_sd)
    p_off = convert_dinov2(official)
    flat_hf = {
        jax.tree_util.keystr(k): v
        for k, v in jax.tree_util.tree_leaves_with_path(p_hf)
    }
    flat_off = {
        jax.tree_util.keystr(k): v
        for k, v in jax.tree_util.tree_leaves_with_path(p_off)
    }
    assert set(flat_hf) == set(flat_off)
    for k in flat_hf:
        np.testing.assert_array_equal(flat_hf[k], flat_off[k], err_msg=k)


# ---------------------------------------------------------------------------
# SuperPoint-open (rpautrat re-training; BN after relu, eps 1e-3,
# non-legacy descriptor sampling)
# ---------------------------------------------------------------------------


def test_superpoint_open_forward_parity(monkeypatch):
    import gluefactory.models.extractors.superpoint_open as ref_mod

    from gluefactory_tpu.compat.torch_conversion import convert_superpoint_open
    from gluefactory_tpu.models.extractors.superpoint import SuperPoint

    # the reference _init unconditionally loads a checkpoint (from URL in
    # this zero-egress env) — neutralize the load, keep the random init
    monkeypatch.setattr(
        ref_mod.SuperPoint, "load_state_dict", lambda self, sd, **kw: None
    )
    monkeypatch.setattr(
        torch.hub, "load_state_dict_from_url", lambda *a, **kw: {}, raising=False
    )

    torch.manual_seed(0)
    K = 64
    ref = ref_mod.SuperPoint(
        {
            "max_num_keypoints": K,
            "detection_threshold": 0.0,
            "nms_radius": 4,
            "remove_borders": 4,
            "dense_outputs": True,
        }
    )
    ref.eval()
    # harden: non-trivial BN affine params and running stats
    gen = torch.Generator().manual_seed(7)
    with torch.no_grad():
        for m in ref.modules():
            if isinstance(m, torch.nn.BatchNorm2d):
                m.weight.copy_(0.5 + torch.rand(m.weight.shape, generator=gen))
                m.bias.copy_(torch.rand(m.bias.shape, generator=gen) - 0.5)
                m.running_mean.copy_(
                    torch.rand(m.running_mean.shape, generator=gen) - 0.5
                )
                m.running_var.copy_(
                    0.5 + torch.rand(m.running_var.shape, generator=gen)
                )

    rng = np.random.default_rng(0)
    img = rng.uniform(0, 1, (1, 96, 128, 1)).astype(np.float32)
    with torch.no_grad():
        ref_out = ref({"image": torch.from_numpy(img.transpose(0, 3, 1, 2))})

    params, stats = convert_superpoint_open(_sd(ref))
    sp = SuperPoint.from_conf(
        {
            "variant": "open",
            "max_num_keypoints": K,
            "detection_threshold": 0.0,
            "nms_radius": 4,
            "remove_borders": 4,
            "dense_outputs": True,
        }
    )
    out = sp.apply(
        {"params": params, "batch_stats": stats},
        {"image": jnp.asarray(img)},
    )

    np.testing.assert_allclose(
        np.asarray(out["dense_descriptors"])[0],
        _np(ref_out["dense_descriptors"])[0].transpose(1, 2, 0),
        atol=1e-5,
    )

    mask = np.asarray(out["keypoint_mask"])[0]
    assert mask.all(), "expected a full top-K at threshold 0"
    kpts = np.asarray(out["keypoints"])[0]
    scores = np.asarray(out["keypoint_scores"])[0]
    desc = np.asarray(out["descriptors"])[0]
    ref_kpts = _np(ref_out["keypoints"])[0]
    ref_scores = _np(ref_out["keypoint_scores"])[0]
    ref_desc = _np(ref_out["descriptors"])[0]

    def order(k):
        return np.lexsort((k[:, 0], k[:, 1]))

    oi, oj = order(kpts), order(ref_kpts)
    np.testing.assert_allclose(kpts[oi], ref_kpts[oj], atol=1e-4)
    np.testing.assert_allclose(scores[oi], ref_scores[oj], atol=1e-5)
    np.testing.assert_allclose(desc[oi], ref_desc[oj], atol=5e-4)


def test_dinov2_pos_embed_interpolation_matches_torch():
    """The pos-embed bicubic resize reproduces the official
    interpolate_pos_encoding's torch op exactly:
    F.interpolate(mode='bicubic', align_corners=False, antialias=False)."""
    import torch.nn.functional as F

    from gluefactory_tpu.models.backbones.dinov2 import _bicubic_matrix

    rng = np.random.default_rng(3)
    g, d = 7, 5
    grid = rng.normal(size=(g, g, d)).astype(np.float32)
    for ph, pw in ((3, 4), (10, 9), (7, 13)):
        wy = np.asarray(_bicubic_matrix(ph, g))
        wx = np.asarray(_bicubic_matrix(pw, g))
        mine = np.einsum("oi,ijd,pj->opd", wy, grid, wx)
        ref = F.interpolate(
            torch.from_numpy(grid.transpose(2, 0, 1))[None],
            size=(ph, pw),
            mode="bicubic",
            align_corners=False,
            antialias=False,
        )[0].permute(1, 2, 0).numpy()
        np.testing.assert_allclose(mine, ref, atol=2e-5, err_msg=f"{ph}x{pw}")


def test_dinov2_allow_resize_matches_torch_upsample():
    """allow_resize reproduces the reference's F.upsample (legacy nearest)
    image resize to /patch multiples (reference dinov2.py:17-18)."""
    import torch.nn.functional as F

    from gluefactory_tpu.models.backbones.dinov2 import DinoV2

    rng = np.random.default_rng(4)
    img = rng.uniform(0, 1, (1, 31, 45, 3)).astype(np.float32)
    p = 14
    ph, pw = 31 // p, 45 // p
    ref = F.upsample(
        torch.from_numpy(img.transpose(0, 3, 1, 2)), [ph * p, pw * p]
    ).numpy().transpose(0, 2, 3, 1)

    iy = np.floor(np.arange(ph * p) * (31 / (ph * p))).astype(int)
    ix = np.floor(np.arange(pw * p) * (45 / (pw * p))).astype(int)
    mine = img[:, iy][:, :, ix]
    np.testing.assert_array_equal(mine, ref)
    del DinoV2  # imported to assert the model module stays importable

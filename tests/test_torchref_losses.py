"""NON-CIRCULAR loss parity: the EXECUTING torch reference's training
losses vs ours, on identical inputs + ground truth.

The forwards are parity-tested in `test_torchref_parity.py`; here the loss
math itself is isolated by feeding the REFERENCE's own forward outputs
(`ref_descriptors`, `log_assignment`, ...) into both sides, with the
reference's randomly initialized official-layout weights converted for the
heads our loss re-runs.

Reference entry points exercised:
  - gluefactory/models/utils/losses.py:6-60 (NLLLoss / weight_loss)
  - gluefactory/models/matchers/lightglue.py:578-627 (deep supervision,
    gamma weighting, token-confidence BCE, train/eval split)
  - gluefactory_nonfree/superglue.py:321-352
  - gluefactory/models/matchers/gluestick.py:378-462 (sub_loss incl.
    inter-layer supervision weights + diagnostics)
"""

import jax.numpy as jnp
import numpy as np
import pytest

torch = pytest.importorskip("torch")

from torchref import load_reference  # noqa: E402

load_reference()

from gluefactory_tpu.compat.torch_conversion import convert_lightglue  # noqa: E402

pytestmark = pytest.mark.torchref


def _np(x):
    return x.detach().cpu().numpy() if isinstance(x, torch.Tensor) else np.asarray(x)


def _sd(model):
    return {k: v.detach().cpu().numpy() for k, v in model.state_dict().items()}


def _make_gt(rng, m, n, n_pos=12, n_ignore=4, batch=1):
    """Consistent random GT: n_pos 1:1 matches, n_ignore -2 slots per side,
    the rest unmatchable (-1)."""
    a = np.zeros((batch, m, n), bool)
    gm0 = np.full((batch, m), -1, np.int64)
    gm1 = np.full((batch, n), -1, np.int64)
    for b in range(batch):
        p0 = rng.permutation(m)[:n_pos]
        p1 = rng.permutation(n)[:n_pos]
        for i, j in zip(p0, p1):
            a[b, i, j] = True
            gm0[b, i] = j
            gm1[b, j] = i
        un0 = np.flatnonzero(gm0[b] == -1)
        gm0[b, rng.choice(un0, n_ignore, replace=False)] = -2
        un1 = np.flatnonzero(gm1[b] == -1)
        gm1[b, rng.choice(un1, n_ignore, replace=False)] = -2
    return a, gm0, gm1


def _gt_torch(a, gm0, gm1):
    return {
        "gt_assignment": torch.from_numpy(a),
        "gt_matches0": torch.from_numpy(gm0),
        "gt_matches1": torch.from_numpy(gm1),
    }


def _gt_jax(a, gm0, gm1):
    return {
        "gt_assignment": jnp.asarray(a),
        "gt_matches0": jnp.asarray(gm0),
        "gt_matches1": jnp.asarray(gm1),
    }


# ---------------------------------------------------------------------------
# LightGlue
# ---------------------------------------------------------------------------


def _lightglue_pair(gamma, dim=64, heads=2, n_layers=3, seed=3):
    from gluefactory.models.matchers.lightglue import LightGlue as RefLightGlue

    from gluefactory_tpu.models.matchers.lightglue import LightGlue

    torch.manual_seed(seed)
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
            "loss": {"gamma": gamma},
        }
    )
    params = convert_lightglue(_sd(ref), n_layers=n_layers, dim=dim, num_heads=heads)
    mine = LightGlue.from_conf(
        {
            "input_dim": dim,
            "descriptor_dim": dim,
            "n_layers": n_layers,
            "num_heads": heads,
            "checkpointed": False,
            "filter_threshold": 0.1,
            "loss": {"gamma": gamma},
        }
    )
    return ref, mine, params


def _lg_loss_case(gamma, train, seed=3):
    m, n, dim = 40, 48, 64
    ref, mine, params = _lightglue_pair(gamma, dim=dim, seed=seed)
    ref.train(train)
    rng = np.random.default_rng(seed)
    data_np = {
        "keypoints0": rng.uniform(5, 90, (1, m, 2)).astype(np.float32),
        "keypoints1": rng.uniform(5, 90, (1, n, 2)).astype(np.float32),
        "descriptors0": rng.normal(size=(1, m, dim)).astype(np.float32),
        "descriptors1": rng.normal(size=(1, n, dim)).astype(np.float32),
        "image_size": np.asarray([[128.0, 96.0]], np.float32),
    }
    data_t = {
        **{k: torch.from_numpy(v) for k, v in data_np.items() if k != "image_size"},
        "view0": {"image_size": torch.from_numpy(data_np["image_size"])},
        "view1": {"image_size": torch.from_numpy(data_np["image_size"])},
    }
    a, gm0, gm1 = _make_gt(rng, m, n)
    with torch.no_grad():
        pred_t = ref(data_t)
        ref_losses, ref_metrics = ref.loss(pred_t, {**data_t, **_gt_torch(a, gm0, gm1)})

    # feed the REFERENCE's stashed descriptors/log-assignment into OUR loss
    pred_j = {
        "ref_descriptors0": jnp.asarray(_np(pred_t["ref_descriptors0"])),
        "ref_descriptors1": jnp.asarray(_np(pred_t["ref_descriptors1"])),
        "log_assignment": jnp.asarray(_np(pred_t["log_assignment"])),
        "matches0": jnp.asarray(_np(pred_t["matches0"])),
        "matches1": jnp.asarray(_np(pred_t["matches1"])),
        "matching_scores0": jnp.asarray(_np(pred_t["matching_scores0"])),
        "matching_scores1": jnp.asarray(_np(pred_t["matching_scores1"])),
    }
    my_losses, my_metrics = mine.apply(
        {"params": params},
        pred_j,
        _gt_jax(a, gm0, gm1),
        train=train,
        method="loss",
    )
    return ref_losses, ref_metrics, my_losses, my_metrics


@pytest.mark.parametrize("gamma", [0.0, 0.5, 1.0, 2.0])
def test_lightglue_train_loss_parity(gamma):
    """Training-mode deep supervision: the gamma**(N-i-1) (gamma>0) vs i+1
    (gamma<=0) weighting, weight-sum normalization, confidence BCE, and the
    diagnostic outputs must all match the executing reference
    (lightglue.py:578-621)."""
    ref_losses, _, my_losses, my_metrics = _lg_loss_case(gamma, train=True)
    assert my_metrics == {}  # reference computes metrics only at eval
    for key in (
        "total",
        "last",
        "assignment_nll",
        "nll_pos",
        "nll_neg",
        "num_matchable",
        "num_unmatchable",
        "row_norm",
        "confidence",
    ):
        np.testing.assert_allclose(
            np.asarray(my_losses[key]),
            _np(ref_losses[key]).reshape(np.asarray(my_losses[key]).shape),
            atol=1e-4,
            err_msg=f"gamma={gamma} key={key}",
        )


def test_lightglue_eval_loss_parity():
    """Eval mode: the reference stashes only the final layer
    (lightglue.py:485-487), so the loss is the final NLL with no deep
    supervision/confidence term, and matcher metrics are returned."""
    ref_losses, ref_metrics, my_losses, my_metrics = _lg_loss_case(1.0, train=False)
    assert "confidence" not in my_losses
    for key in ("total", "assignment_nll", "nll_pos", "nll_neg", "row_norm"):
        np.testing.assert_allclose(
            np.asarray(my_losses[key]),
            _np(ref_losses[key]).reshape(np.asarray(my_losses[key]).shape),
            atol=1e-4,
            err_msg=key,
        )
    for key in ("match_recall", "match_precision", "accuracy"):
        np.testing.assert_allclose(
            np.asarray(my_metrics[key]), _np(ref_metrics[key]), atol=1e-4, err_msg=key
        )


def test_lightglue_nll_per_side_clamping():
    """weight_loss clamps each side's negative count separately
    (losses.py:13-23): with zero unmatchable on side 0 the denominators
    differ from the clamp-the-sum formula."""
    from gluefactory.models.utils.losses import NLLLoss

    from gluefactory_tpu.models.losses import nll_components

    rng = np.random.default_rng(0)
    m, n = 8, 10
    la = rng.normal(size=(1, m + 1, n + 1)).astype(np.float32)
    # every row matched or ignored -> neg0 empty; some neg on side 1
    a = np.zeros((1, m, n), bool)
    gm0 = np.full((1, m), -2, np.int64)
    gm1 = np.full((1, n), -1, np.int64)
    for i in range(4):
        a[0, i, i] = True
        gm0[0, i] = i
        gm1[0, i] = i
    ref_fn = NLLLoss({"nll_balancing": 0.5, "gamma_f": 0.0})
    nll_t, _, met = ref_fn(
        {"log_assignment": torch.from_numpy(la)}, _gt_torch(a, gm0, gm1)
    )
    nll_pos, nll_neg, num_pos, num_neg = nll_components(
        jnp.asarray(la),
        jnp.asarray(a),
        jnp.asarray(gm0),
        jnp.asarray(gm1),
        per_side_clamp=True,
    )
    np.testing.assert_allclose(
        np.asarray(0.5 * nll_pos + 0.5 * nll_neg), _np(nll_t), atol=1e-5
    )
    np.testing.assert_allclose(np.asarray(nll_pos), _np(met["nll_pos"]), atol=1e-5)
    np.testing.assert_allclose(np.asarray(nll_neg), _np(met["nll_neg"]), atol=1e-5)
    np.testing.assert_allclose(np.asarray(num_pos), _np(met["num_matchable"]))
    np.testing.assert_allclose(np.asarray(num_neg), _np(met["num_unmatchable"]))


# ---------------------------------------------------------------------------
# SuperGlue
# ---------------------------------------------------------------------------


def test_superglue_loss_parity():
    """NLL on the transport plan + diagnostics (superglue.py:321-352):
    clamp-the-sum negatives, num stats, bin_score passthrough."""
    from gluefactory_nonfree.superglue import SuperGlue as RefSuperGlue

    from gluefactory_tpu.models.matchers.superglue import SuperGlue

    torch.manual_seed(0)
    ref = RefSuperGlue({"weights": None, "GNN_layers": ["self", "cross"]})
    rng = np.random.default_rng(1)
    m, n = 24, 30
    la = rng.normal(size=(2, m + 1, n + 1)).astype(np.float32)
    a, gm0, gm1 = _make_gt(rng, m, n, n_pos=8, n_ignore=3, batch=2)
    with torch.no_grad():
        ref_losses = ref.loss(
            {"log_assignment": torch.from_numpy(la)}, _gt_torch(a, gm0, gm1)
        )

    mine = SuperGlue.from_conf({"n_layers": 1})
    my_losses, my_metrics = mine.apply(
        {"params": {"bin_score": jnp.asarray(float(ref.bin_score))}},
        {"log_assignment": jnp.asarray(la)},
        _gt_jax(a, gm0, gm1),
        train=True,
        method="loss",
    )
    assert my_metrics == {}
    for key in (
        "total",
        "assignment_nll",
        "nll_pos",
        "nll_neg",
        "num_matchable",
        "num_unmatchable",
        "bin_score",
    ):
        np.testing.assert_allclose(
            np.asarray(my_losses[key]),
            np.broadcast_to(
                _np(ref_losses[key]), np.asarray(my_losses[key]).shape
            ),
            atol=1e-5,
            err_msg=key,
        )


# ---------------------------------------------------------------------------
# GlueStick
# ---------------------------------------------------------------------------


def test_gluestick_loss_parity():
    """Point + line + inter-layer sub-losses with the reference's
    layer weights from `loss.inter_supervision` and the sinkhorn_norm /
    bin_score / num_(un)matchable diagnostics (gluestick.py:378-438)."""
    from gluefactory.models.matchers.gluestick import GlueStick as RefGlueStick

    from gluefactory_tpu.models.matchers.gluestick import GlueStick

    torch.manual_seed(2)
    ref = RefGlueStick(
        {
            "input_dim": 32,
            "descriptor_dim": 32,
            "keypoint_encoder": [16, 32],
            "GNN_layers": ["self", "cross"] * 2,
            "inter_supervision": [0],
            "loss": {"nll_weight": 0.7, "inter_supervision": [0.3]},
        }
    )
    ref.train()

    rng = np.random.default_rng(5)
    m, n, l0, l1 = 20, 26, 8, 9
    pred_np = {
        "log_assignment": rng.normal(size=(1, m + 1, n + 1)).astype(np.float32),
        "line_log_assignment": rng.normal(size=(1, l0 + 1, l1 + 1)).astype(np.float32),
        "line_0_log_assignment": rng.normal(size=(1, l0 + 1, l1 + 1)).astype(
            np.float32
        ),
    }
    a, gm0, gm1 = _make_gt(rng, m, n, n_pos=6, n_ignore=2)
    la_, lgm0, lgm1 = _make_gt(rng, l0, l1, n_pos=3, n_ignore=1)
    data_np = {
        "keypoints0": rng.normal(size=(1, m, 2)).astype(np.float32),
        "keypoints1": rng.normal(size=(1, n, 2)).astype(np.float32),
        "lines0": rng.normal(size=(1, l0, 2, 2)).astype(np.float32),
        "lines1": rng.normal(size=(1, l1, 2, 2)).astype(np.float32),
    }
    gt_t = {
        **_gt_torch(a, gm0, gm1),
        "gt_line_assignment": torch.from_numpy(la_),
        "gt_line_matches0": torch.from_numpy(lgm0),
        "gt_line_matches1": torch.from_numpy(lgm1),
    }
    with torch.no_grad():
        ref_losses, ref_metrics = ref.loss(
            {k: torch.from_numpy(v) for k, v in pred_np.items()},
            {**{k: torch.from_numpy(v) for k, v in data_np.items()}, **gt_t},
        )
    assert ref_metrics == {}

    mine = GlueStick.from_conf(
        {
            "input_dim": 32,
            "descriptor_dim": 32,
            "keypoint_encoder": [16, 32],
            "n_layers": 2,
            "inter_supervision": [0],
            "loss": {"nll_weight": 0.7, "inter_supervision": [0.3]},
        }
    )
    pred_j = {
        **{k: jnp.asarray(v) for k, v in pred_np.items()},
        # shape-only keys for the has-points/has-lines gating
        "matches0": jnp.zeros((1, m), jnp.int32),
        "matches1": jnp.zeros((1, n), jnp.int32),
    }
    data_j = {
        **{k: jnp.asarray(v) for k, v in data_np.items()},
        **_gt_jax(a, gm0, gm1),
        "gt_line_assignment": jnp.asarray(la_),
        "gt_line_matches0": jnp.asarray(lgm0),
        "gt_line_matches1": jnp.asarray(lgm1),
    }
    my_losses, my_metrics = mine.apply(
        {
            "params": {
                "bin_score": jnp.asarray(float(ref.bin_score)),
                "line_bin_score": jnp.asarray(float(ref.line_bin_score)),
            }
        },
        pred_j,
        data_j,
        train=True,
        method="loss",
    )
    assert my_metrics == {}
    for key in (
        "total",
        "assignment_nll",
        "line_assignment_nll",
        "line_0_assignment_nll",
        "num_matchable",
        "num_unmatchable",
        "sinkhorn_norm",
        "bin_score",
        "line_num_matchable",
        "line_num_unmatchable",
        "line_sinkhorn_norm",
        "line_bin_score",
    ):
        np.testing.assert_allclose(
            np.asarray(my_losses[key]),
            np.broadcast_to(_np(ref_losses[key]), np.asarray(my_losses[key]).shape),
            atol=1e-5,
            err_msg=key,
        )

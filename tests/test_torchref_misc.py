"""NON-CIRCULAR parity for the NN matcher and the metric accumulators vs the
executing reference (`models/matchers/nearest_neighbor_matcher.py`,
`utils/tools.py`)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

torch = pytest.importorskip("torch")

pytestmark = pytest.mark.torchref

from torchref import load_reference  # noqa: E402

load_reference()

import gluefactory.utils.tools as ref_tools  # noqa: E402
from gluefactory.models.matchers.nearest_neighbor_matcher import (  # noqa: E402
    NearestNeighborMatcher as RefNN,
)

from gluefactory_tpu.models.matchers.nearest_neighbor_matcher import (  # noqa: E402
    NearestNeighborMatcher,
)
from gluefactory_tpu.utils import tools as my_tools  # noqa: E402


def _descs(rng, B, N, D):
    d = rng.normal(size=(B, N, D)).astype(np.float32)
    return d / np.linalg.norm(d, axis=-1, keepdims=True)


@pytest.mark.parametrize(
    "conf",
    [
        {"mutual_check": True},
        {"mutual_check": True, "ratio_thresh": 0.95, "distance_thresh": 0.7},
        {"mutual_check": False},
    ],
)
def test_nn_matcher_forward_parity(conf):
    rng = np.random.default_rng(0)
    B, N0, N1, D = 2, 24, 28, 32
    d0 = _descs(rng, B, N0, D)
    # half of view1 descriptors are noisy copies of view0's -> real matches
    d1 = _descs(rng, B, N1, D)
    d1[:, :12] = d0[:, :12] + rng.normal(0, 0.1, (B, 12, D)).astype(np.float32)
    d1 = d1 / np.linalg.norm(d1, axis=-1, keepdims=True)

    ref = RefNN(dict(conf))
    ref.eval()
    with torch.no_grad():
        ref_out = ref(
            {
                "descriptors0": torch.from_numpy(d0),
                "descriptors1": torch.from_numpy(d1),
            }
        )

    nn = NearestNeighborMatcher.from_conf(dict(conf))
    out = nn.apply(
        {"params": {}},
        {"descriptors0": jnp.asarray(d0), "descriptors1": jnp.asarray(d1)},
    )

    np.testing.assert_array_equal(
        np.asarray(out["matches0"]), ref_out["matches0"].numpy()
    )
    np.testing.assert_array_equal(
        np.asarray(out["matches1"]), ref_out["matches1"].numpy()
    )
    np.testing.assert_allclose(
        np.asarray(out["matching_scores0"]),
        ref_out["matching_scores0"].numpy(),
        atol=0,
    )
    np.testing.assert_allclose(
        np.asarray(out["log_assignment"]),
        ref_out["log_assignment"].numpy(),
        atol=1e-5,
    )


def test_nn_matcher_npair_loss_parity():
    rng = np.random.default_rng(1)
    B, N0, N1, D = 2, 16, 18, 32
    d0 = _descs(rng, B, N0, D)
    d1 = _descs(rng, B, N1, D)
    gt = np.zeros((B, N0, N1), bool)
    for b in range(B):
        idx = rng.choice(N1, 10, replace=False)
        gt[b, np.arange(10), idx] = True

    ref = RefNN({"loss": "N_pair"})
    ref.train()  # metrics branch off; loss math identical
    ref_out = ref(
        {
            "descriptors0": torch.from_numpy(d0),
            "descriptors1": torch.from_numpy(d1),
        }
    )
    ref_losses, _ = ref.loss(
        ref_out,
        {"gt_assignment": torch.from_numpy(gt)},
    )

    nn = NearestNeighborMatcher.from_conf({"loss": "N_pair"})
    variables = nn.init(
        jax.random.key(0),
        {"descriptors0": jnp.asarray(d0), "descriptors1": jnp.asarray(d1)},
    )
    out = nn.apply(
        variables,
        {"descriptors0": jnp.asarray(d0), "descriptors1": jnp.asarray(d1)},
    )
    losses, _ = nn.apply(
        variables,
        out,
        {"gt_assignment": jnp.asarray(gt)},
        method=nn.loss,
    )
    for k in ("n_pair_nll", "total", "num_matchable", "n_pair_temperature"):
        np.testing.assert_allclose(
            np.asarray(losses[k]),
            ref_losses[k].detach().numpy(),
            atol=1e-5,
            err_msg=k,
        )


def test_metric_accumulators_parity():
    rng = np.random.default_rng(2)
    chunks = [
        rng.normal(3, 2, 17).astype(np.float32),
        np.array([np.nan, 1.0, 2.0], np.float32),
        rng.normal(-1, 5, 9).astype(np.float32),
    ]

    pairs = [
        (my_tools.AverageMetric(), ref_tools.AverageMetric()),
        (my_tools.MedianMetric(), ref_tools.MedianMetric()),
        (my_tools.QuantileMetric(q=0.05), ref_tools.QuantileMetric(q=0.05)),
        (my_tools.RecallMetric([1.0, 3.0]), ref_tools.RecallMetric([1.0, 3.0])),
    ]
    for mine, ref in pairs:
        for c in chunks:
            mine.update(c)
            ref.update(torch.from_numpy(c))
        a = np.asarray(mine.compute(), dtype=np.float64)
        b = np.asarray(ref.compute(), dtype=np.float64)
        np.testing.assert_allclose(a, b, atol=1e-7, err_msg=type(ref).__name__)

    # AUC: reference rounds to 4 decimals — ours must match digit-for-digit
    errs = np.abs(rng.normal(0, 10, 200))
    mine = my_tools.AUCMetric([5, 10, 20], errs).compute()
    ref = ref_tools.AUCMetric([5, 10, 20], errs).compute()
    np.testing.assert_array_equal(np.asarray(mine), np.asarray(ref))


def test_matcher_metrics_parity():
    """`models/metrics.matcher_metrics` vs the EXECUTING reference
    `models/utils/metrics.py:5-51` on random matches incl. -1/-2 labels."""
    from gluefactory.models.utils.metrics import matcher_metrics as ref_metrics

    from gluefactory_tpu.models.metrics import matcher_metrics

    rng = np.random.default_rng(3)
    B, N, M = 4, 37, 29
    gt = rng.integers(-2, M, size=(B, N))
    m = np.where(rng.uniform(size=(B, N)) < 0.3, -1, rng.integers(0, M, (B, N)))
    # force some agreements so recall/precision are non-trivial
    agree = rng.uniform(size=(B, N)) < 0.4
    m = np.where(agree & (gt >= 0), gt, m)
    scores = rng.uniform(size=(B, N)).astype(np.float32)

    pred_t = {
        "matches0": torch.from_numpy(m),
        "matching_scores0": torch.from_numpy(scores),
    }
    data_t = {"gt_matches0": torch.from_numpy(gt)}
    ref = ref_metrics(pred_t, data_t)

    pred_j = {
        "matches0": jnp.asarray(m),
        "matching_scores0": jnp.asarray(scores),
    }
    data_j = {"gt_matches0": jnp.asarray(gt)}
    mine = matcher_metrics(pred_j, data_j)

    assert set(ref) == set(mine)
    for k in ref:
        np.testing.assert_allclose(
            np.asarray(mine[k]), ref[k].numpy(), rtol=1e-5, atol=1e-6, err_msg=k
        )


def test_matcher_metrics_prefix_and_padding_inert():
    from gluefactory_tpu.models.metrics import matcher_metrics

    rng = np.random.default_rng(0)
    B, N, M, P = 2, 20, 15, 8
    gt = rng.integers(-2, M, size=(B, N))
    m = rng.integers(-1, M, size=(B, N))
    scores = rng.uniform(size=(B, N)).astype(np.float32)
    base = matcher_metrics(
        {"line_matches0": jnp.asarray(m), "line_matching_scores0": jnp.asarray(scores)},
        {"gt_line_matches0": jnp.asarray(gt)},
        prefix="line_",
    )
    assert set(base) == {
        "line_match_recall",
        "line_match_precision",
        "line_accuracy",
        "line_average_precision",
    }
    # appending padded slots (-2 GT ignore, -1 prediction, score 0) must not
    # change any metric
    gt_p = np.concatenate([gt, np.full((B, P), -2)], axis=1)
    m_p = np.concatenate([m, np.full((B, P), -1)], axis=1)
    s_p = np.concatenate([scores, np.zeros((B, P), np.float32)], axis=1)
    padded = matcher_metrics(
        {
            "line_matches0": jnp.asarray(m_p),
            "line_matching_scores0": jnp.asarray(s_p),
        },
        {"gt_line_matches0": jnp.asarray(gt_p)},
        prefix="line_",
    )
    for k in base:
        np.testing.assert_allclose(
            np.asarray(base[k]), np.asarray(padded[k]), rtol=1e-5, atol=1e-6,
            err_msg=k,
        )

"""End-to-end training smoke tests: SuperPoint+LightGlue on synthetic
homography pairs must overfit (loss decreases, recall rises) on an 8-device
CPU mesh — the reference's de-facto test affordance (SURVEY §4 overfit mode),
plus the multi-device capability the reference never had."""

import numpy as np
import pytest

from gluefactory_tpu.core.config import Config, merge
from gluefactory_tpu.train import default_conf, main_args, training


@pytest.fixture(scope="module")
def tiny_conf(tmp_path_factory):
    return merge(
        Config(default_conf),
        {
            "data": {
                "name": "homographies",
                "synthetic_images": 16,
                "train_size": 8,
                "val_size": 2,
                "train_batch_size": 8,
                "val_batch_size": 2,
                "source_size": [160, 120],
                "homography": {"patch_shape": [160, 120], "difficulty": 0.5},
                "photometric": {"name": "identity", "p": 0.0},
            },
            "model": {
                "name": "two_view_pipeline",
                "extractor": {
                    "name": "superpoint",
                    "max_num_keypoints": 64,
                    "detection_threshold": 0.0,
                    "force_num_keypoints": True,
                    "trainable": False,
                },
                "matcher": {
                    "name": "lightglue",
                    "n_layers": 2,
                    "descriptor_dim": 64,
                    "num_heads": 2,
                    "checkpointed": False,
                },
                "ground_truth": {"name": "homography_matcher", "th_positive": 3.0},
            },
            "train": {
                "seed": 0,
                "epochs": 2,
                "lr": 3e-4,
                "log_every_iter": 1,
                "eval_every_iter": 1000,
                "keep_last_checkpoints": 2,
            },
        },
    )


@pytest.mark.slow
def test_training_runs_and_checkpoints(tiny_conf, tmp_path):
    args = main_args(["test_exp", "--no_tensorboard", "--max_val_iters", "1"])
    out_dir = tmp_path / "exp"
    variables = training(tiny_conf, out_dir, args)
    assert (out_dir / "config.yaml").exists()
    ckpts = list(out_dir.glob("checkpoint_*.msgpack"))
    assert len(ckpts) >= 1
    assert (out_dir / "checkpoint_best.msgpack").exists()
    # params are finite
    import jax

    for leaf in jax.tree.leaves(variables["params"]):
        assert np.isfinite(np.asarray(leaf)).all()


@pytest.mark.slow
def test_overfit_loss_decreases(tiny_conf, tmp_path):
    """Frozen random SuperPoint + trainable LightGlue on a single repeated
    batch: the assignment NLL must drop substantially."""
    import jax

    from gluefactory_tpu.data import get_dataset
    from gluefactory_tpu.data.base_dataset import prepare_batch
    from gluefactory_tpu.models import get_model
    from gluefactory_tpu.train import (
        build_optimizer,
        make_mesh,
        make_train_step,
        shard_batch,
        strip_non_arrays,
    )

    conf = tiny_conf
    dataset = get_dataset("homographies")(conf.data)
    batch = next(iter(dataset.get_data_loader("train")))
    batch = strip_non_arrays(prepare_batch(batch))

    model = get_model("two_view_pipeline").from_conf(
        {k: v for k, v in conf.model.to_dict().items() if k != "name"}
    )
    rngs = {"params": jax.random.key(0), "sample": jax.random.key(1)}
    variables = dict(model.init(rngs, batch, method="initialize"))
    tx, _ = build_optimizer(conf.train, variables["params"], model, 10)
    opt_state = tx.init(variables["params"])
    mesh = make_mesh()
    step = jax.jit(make_train_step(model, tx))
    batch_dev = shard_batch(batch, mesh)

    losses_hist = []
    for i in range(80):
        variables, opt_state, losses, metrics, info = step(
            variables, opt_state, batch_dev, jax.random.key(i)
        )
        losses_hist.append(float(losses["total"]))
    assert np.isfinite(losses_hist).all()
    # seeded convergence envelope (measured round 2 on the 8-device CPU
    # mesh: loss 4.39 -> 1.03, recall 0 -> 0.75, precision 0.69 at step 80;
    # bands are ~50% slack to absorb library-version jitter)
    assert 3.0 < losses_hist[0] < 6.5, losses_hist[0]
    assert losses_hist[-1] < 1.6, losses_hist[-5:]
    # matcher_metrics are gated out of the jitted train step (reference
    # computes them under `not self.training` only) — read them from an
    # eval-mode pass
    from gluefactory_tpu.train import make_eval_step

    eval_losses, metrics, _ = jax.jit(make_eval_step(model))(
        variables, batch_dev, jax.random.key(99)
    )
    assert float(np.asarray(metrics["match_recall"]).mean()) > 0.55, metrics
    assert float(np.asarray(metrics["match_precision"]).mean()) > 0.5, metrics


@pytest.mark.slow
def test_multi_step_dispatch(tiny_conf, tmp_path):
    """steps_per_dispatch>1: K chained optimizer steps in one jitted call
    must train equivalently (loss decreases, checkpoints written)."""
    from gluefactory_tpu.core.config import merge

    conf = merge(tiny_conf, {"train": {"epochs": 2, "steps_per_dispatch": 2},
                             "data": {"train_size": 8, "train_batch_size": 4}})
    args = main_args(["test_exp_k2", "--no_tensorboard", "--max_val_iters", "1"])
    out_dir = tmp_path / "exp_k2"
    variables = training(conf, out_dir, args)
    import jax

    for leaf in jax.tree.leaves(variables["params"]):
        assert np.isfinite(np.asarray(leaf)).all()
    assert (out_dir / "checkpoint_best.msgpack").exists()


@pytest.mark.slow
def test_grad_accumulation_matches_big_batch():
    """`train.grad_accumulation=k` over k micro-batches equals one optimizer
    step on the concatenated batch (equal micro-batch sizes, f32): optax
    MultiSteps averages the accumulated grads, and mean-of-means over equal
    splits is the global mean."""
    import jax
    import jax.numpy as jnp

    from gluefactory_tpu.core.config import Config
    from gluefactory_tpu.models import get_model
    from gluefactory_tpu.train import (
        build_optimizer,
        default_train_conf,
        make_train_step,
    )

    conf = {
        "matcher": {
            "name": "lightglue",
            "n_layers": 2,
            "descriptor_dim": 64,
            "input_dim": 64,
            "num_heads": 2,
            "checkpointed": False,
        },
        "ground_truth": {"name": "homography_matcher"},
        "allow_no_extract": True,
    }
    model = get_model("two_view_pipeline").from_conf(conf)

    def make_feat_batch(b, seed):
        rng = np.random.default_rng(seed)
        n, d = 24, 64
        size = np.tile(np.asarray([[64.0, 64.0]], np.float32), (b, 1))
        return {
            "view0": {"image_size": jnp.asarray(size)},
            "view1": {"image_size": jnp.asarray(size)},
            "cache0": None,  # unused; features supplied directly
            "keypoints0": jnp.asarray(rng.uniform(0, 64, (b, n, 2)), jnp.float32),
            "keypoints1": jnp.asarray(rng.uniform(0, 64, (b, n, 2)), jnp.float32),
            "descriptors0": jnp.asarray(rng.normal(size=(b, n, d)), jnp.float32),
            "descriptors1": jnp.asarray(rng.normal(size=(b, n, d)), jnp.float32),
            "keypoint_scores0": jnp.ones((b, n), jnp.float32),
            "keypoint_scores1": jnp.ones((b, n), jnp.float32),
            "H_0to1": jnp.tile(jnp.eye(3, dtype=jnp.float32)[None], (b, 1, 1)),
        }

    # LightGlue consumes suffixed features via the pipeline's no-extract path
    # only when views carry caches; simpler: drive the matcher directly
    matcher = get_model("lightglue").from_conf(conf["matcher"])
    gt = get_model("homography_matcher").from_conf({})

    class Wrapper:
        """Minimal model facade for make_train_step/build_optimizer."""

        conf = matcher.conf
        components = []

        def apply(self, variables, batch, method=None, mutable=None, rngs=None):
            pred = matcher.apply(
                {"params": variables["params"]}, batch, rngs=rngs
            )
            gt_pred = gt.apply({"params": {}}, {**batch, **pred})
            losses, metrics = matcher.apply(
                {"params": variables["params"]},
                pred,
                {**batch, **gt_pred},
                method="loss",
            )
            return ((pred, losses, metrics), {})

        def init(self, rngs, batch):
            return matcher.init(rngs, batch)

    wrapper = Wrapper()
    big = make_feat_batch(4, 0)
    halves = [
        jax.tree.map(lambda x: x[:2] if hasattr(x, "ndim") and x.ndim else x, big),
        jax.tree.map(lambda x: x[2:] if hasattr(x, "ndim") and x.ndim else x, big),
    ]
    variables = {"params": matcher.init({"params": jax.random.key(0)}, big)["params"]}

    def run(accum, batches):
        tconf = Config(dict(default_train_conf, grad_accumulation=accum, lr=1e-3))
        tx, _ = build_optimizer(tconf, variables["params"], wrapper, 10)
        opt_state = tx.init(variables["params"])
        step = jax.jit(make_train_step(wrapper, tx))
        v = dict(variables)
        for i, b in enumerate(batches):
            v, opt_state, losses, metrics, info = step(
                v, opt_state, b, jax.random.key(7)
            )
        return v["params"]

    p_big = run(1, [big])
    p_acc = run(2, halves)
    a = np.concatenate([np.asarray(x).ravel() for x in jax.tree.leaves(p_big)])
    b = np.concatenate([np.asarray(x).ravel() for x in jax.tree.leaves(p_acc)])
    np.testing.assert_allclose(a, b, atol=2e-6, rtol=1e-5)


def test_grad_accum_lr_schedule_counts_real_updates():
    """With grad_accumulation, optax advances the schedule once per REAL
    update, so epoch-based decays must be built in real-update units
    (steps_per_epoch // accum) — else every decay runs accum-times too
    slowly (found by round-5 self-review)."""
    import jax.numpy as jnp
    import pytest as _pytest

    from gluefactory_tpu.core.config import Config as _Config
    from gluefactory_tpu.train import build_optimizer, default_train_conf

    class _Dummy:
        components = []
        conf = _Config({})

    params = {"w": jnp.zeros((2,))}
    conf = _Config(
        dict(
            default_train_conf,
            lr=1.0,
            grad_accumulation=4,
            lr_schedule={"type": "factor", "on_epoch": [1], "factor": 0.1},
        )
    )
    # a loader of 8 micro-batches/epoch = 2 REAL updates/epoch under accum 4;
    # the returned (logging) schedule takes MICRO-step counts
    _, schedule = build_optimizer(conf, params, _Dummy(), 8)
    assert float(schedule(7)) == 1.0  # 1 real update -> still data-epoch 0
    assert float(schedule(8)) == _pytest.approx(0.1)  # 2 updates = epoch 1
    # fractional real-updates/epoch: a 4-batch loader under accum 8 means
    # 1 real update per 2 data epochs — the decay at epoch 1 must fire at
    # the FIRST update, not (floor-truncated) the tenth
    _, sched2 = build_optimizer(conf, params, _Dummy(), 4)
    assert float(sched2(8)) == _pytest.approx(0.1)  # update 2 = data epoch 4

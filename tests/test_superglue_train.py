"""SuperGlue training smoke test: the Sinkhorn-OT matcher must overfit a
fixed synthetic matching problem (loss decreases; BN stats update)."""

import pytest
import jax
import jax.numpy as jnp
import numpy as np
import optax


@pytest.mark.slow
def test_superglue_overfits_synthetic():
    from gluefactory_tpu.models import get_model

    B, N, D = 2, 32, 64
    rng = np.random.default_rng(0)
    sg = get_model("superglue").from_conf(
        {
            "descriptor_dim": D,
            "keypoint_encoder": [16, 32],
            "n_layers": 2,
            "num_heads": 2,
            "sinkhorn_iterations": 20,
            "checkpointed": False,
        }
    )
    desc = rng.normal(size=(B, N, D)).astype(np.float32)
    perm = rng.permutation(N)
    kpts0 = rng.uniform(0, 512, (B, N, 2)).astype(np.float32)
    data = {
        "keypoints0": jnp.asarray(kpts0),
        "keypoints1": jnp.asarray(kpts0[:, perm]),
        "descriptors0": jnp.asarray(desc),
        "descriptors1": jnp.asarray(desc[:, perm] + 0.05 * rng.normal(size=(B, N, D)).astype(np.float32)),
        "keypoint_scores0": jnp.asarray(rng.uniform(0, 1, (B, N)), jnp.float32),
        "keypoint_scores1": jnp.asarray(rng.uniform(0, 1, (B, N)), jnp.float32),
        "view0": {"image_size": jnp.asarray([[512.0, 512.0]] * B)},
        "view1": {"image_size": jnp.asarray([[512.0, 512.0]] * B)},
        "gt_matches0": jnp.tile(jnp.asarray(perm, jnp.int32)[None], (B, 1)),
        "gt_matches1": jnp.tile(jnp.asarray(np.argsort(perm), jnp.int32)[None], (B, 1)),
    }
    gt_ass = np.zeros((B, N, N), bool)
    gt_ass[:, np.arange(N), perm] = True
    data["gt_assignment"] = jnp.asarray(gt_ass)

    variables = dict(sg.init({"params": jax.random.key(0)}, data, method="initialize"))
    tx = optax.adam(3e-4)
    opt_state = tx.init(variables["params"])

    @jax.jit
    def step(variables, opt_state):
        def loss_fn(p):
            outs, updates = sg.apply(
                {"params": p, **{k: v for k, v in variables.items() if k != "params"}},
                data,
                method="forward_with_loss",
                mutable=["batch_stats"],
            )
            _, losses, metrics = outs
            return losses["total"].mean(), (metrics, updates)

        (loss, (metrics, updates)), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            variables["params"]
        )
        upd, opt_state2 = tx.update(grads, opt_state, variables["params"])
        params2 = optax.apply_updates(variables["params"], upd)
        return {"params": params2, **updates}, opt_state2, loss, metrics

    losses = []
    for i in range(40):
        variables, opt_state, loss, metrics = step(variables, opt_state)
        losses.append(float(loss))
    assert np.isfinite(losses).all()
    assert losses[-1] < losses[0] * 0.6, losses[::8]
    # matcher_metrics are train-gated (reference: eval-only) — read them
    # from an eval-mode forward+loss pass
    outs, _ = sg.apply(
        variables, data, train=False, method="forward_with_loss",
        mutable=["batch_stats"],
    )
    _, _, metrics = outs
    recall = float(np.asarray(metrics["match_recall"]).mean())
    assert recall > 0.3, recall


@pytest.mark.slow
def test_superglue_checkpointed_trains():
    """SuperGlue's DEFAULT `checkpointed: True` must support train=True
    forwards + grads (nn.remat with static `train`; round-5 self-review —
    the default path was never exercised, every test forced False)."""
    from gluefactory_tpu.models import get_model

    B, N, D = 1, 24, 64
    rng = np.random.default_rng(1)
    sg = get_model("superglue").from_conf(
        {
            "descriptor_dim": D,
            "keypoint_encoder": [16, 32],
            "n_layers": 2,
            "num_heads": 2,
            "sinkhorn_iterations": 10,
        }
    )
    assert sg.conf.checkpointed  # the point: the shipped default
    data = {
        "keypoints0": jnp.asarray(rng.uniform(0, 256, (B, N, 2)), jnp.float32),
        "keypoints1": jnp.asarray(rng.uniform(0, 256, (B, N, 2)), jnp.float32),
        "descriptors0": jnp.asarray(rng.normal(size=(B, N, D)), jnp.float32),
        "descriptors1": jnp.asarray(rng.normal(size=(B, N, D)), jnp.float32),
        "keypoint_scores0": jnp.asarray(rng.uniform(0, 1, (B, N)), jnp.float32),
        "keypoint_scores1": jnp.asarray(rng.uniform(0, 1, (B, N)), jnp.float32),
        "view0": {"image_size": jnp.asarray([[256.0, 256.0]] * B)},
        "view1": {"image_size": jnp.asarray([[256.0, 256.0]] * B)},
        "gt_matches0": jnp.full((B, N), -1, jnp.int32),
        "gt_matches1": jnp.full((B, N), -1, jnp.int32),
        "gt_assignment": jnp.zeros((B, N, N), bool),
    }
    variables = sg.init({"params": jax.random.key(0)}, data, method="initialize")

    def loss_fn(params):
        pred, _ = sg.apply(
            {"params": params, "batch_stats": variables.get("batch_stats", {})},
            data,
            train=True,
            mutable=["batch_stats"],
        )
        losses, _ = sg.apply(
            {"params": params, "batch_stats": variables.get("batch_stats", {})},
            pred,
            data,
            train=True,
            method="loss",
        )
        return losses["total"].mean()

    loss, grads = jax.value_and_grad(loss_fn)(variables["params"])
    assert np.isfinite(float(loss))
    gnorm = float(
        jnp.sqrt(sum(jnp.sum(jnp.square(g)) for g in jax.tree.leaves(grads)))
    )
    assert np.isfinite(gnorm) and gnorm > 0

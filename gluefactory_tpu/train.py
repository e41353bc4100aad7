"""Training engine: pjit data-parallel training over a TPU mesh.

Role of reference `train.py:220-659`, redesigned TPU-native:
  - the whole step (forward + on-device GT generation + loss + grad +
    optimizer update + NaN-skip) is ONE jitted function over a
    `jax.sharding.Mesh`; the batch is sharded over the "data" axis and XLA
    inserts the gradient all-reduce over ICI (replaces DDP/NCCL,
    reference `train.py:276-339, 483-530`);
  - non-finite-loss skipping is a functional `jnp.where` on the update
    (replaces the all-reduced `do_backward` flag, `train.py:477-488`);
  - frozen components ("trainable: False") are masked out of the optimizer
    with `optax.multi_transform` (replaces requires_grad mutation);
  - mixed precision: params cast to bf16 for the forward pass, fp32 master
    weights and loss (replaces AMP autocast + GradScaler — bf16 on TPU needs
    no loss scaling, `train.py:362-374`);
  - checkpointing: best/last/keep-N msgpack (see `utils/experiments.py`);
  - metrics: streaming accumulators + tensorboard scalars.

CLI: `python -m gluefactory_tpu.train experiment_name --conf conf.yaml
      [dotlist overrides] [--overfit] [--restore] [--distributed]`
"""

from __future__ import annotations

import argparse
import re
import signal
import time
from collections import defaultdict
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np
import optax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from . import logger
from .core.config import Config, from_dotlist, from_yaml, merge
from .data import get_dataset
from .data.base_dataset import prepare_batch
from .models import get_model
from .settings import TRAINING_PATH
from .utils.experiments import (
    delete_old_checkpoints,
    get_last_checkpoint,
    load_checkpoint,
    save_checkpoint,
    update_best_checkpoint,
)
from .utils.retry import retry_transient
from .utils.tools import (
    AverageMetric,
    MedianMetric,
    PRMetric,
    RecallMetric,
    set_seed,
)
from .utils.tensor import map_tensor

default_train_conf = {
    "seed": 0,
    "epochs": 1,
    "optimizer": "adam",  # adam | adamw | sgd | rmsprop
    "optimizer_options": {},
    "opt_regexp": None,  # regexp: only matching params are trained
    "lr": 0.001,
    "lr_schedule": {"type": None, "start": 0, "exp_div_10": 0, "factor": 1.0,
                    "on_epoch": [], "unit": "epoch"},
    "lr_scaling": [],  # [[scale, [regex, ...]], ...]
    "eval_every_iter": 1000,
    "save_every_iter": 5000,
    "log_every_iter": 200,
    "keep_last_checkpoints": 5,
    "load_experiment": None,  # warm start from another experiment
    "median_metrics": [],
    "recall_metrics": {},
    # PR curves over per-element predictions collected during validation:
    # {name: {labels: <pred key>, predictions: <pred key>, mask: <pred key>}}
    # (reference train.py:66,71 `pr_metrics`/`pr_curves` + :96-101 accumulation)
    "pr_curves": {},
    "pr_metrics": {},  # declared by the reference conf surface (vestigial there too)
    "best_key": "loss/total",
    "dataset_callback_fn": None,  # e.g. "sample_new_items" (MegaDepth)
    "dataset_callback_on_val": False,
    "clip_grad": None,
    "mixed_precision": None,  # None | "bf16"
    "log_it": False,
    # chain K optimizer steps inside ONE jitted dispatch (lax.scan over K
    # stacked batches): amortizes per-dispatch overhead — essential on
    # relayed/remote PJRT backends, harmless on local chips
    "steps_per_dispatch": 1,
    # accumulate gradients over K loader batches before each optimizer
    # update (optax.MultiSteps): effective batch = K * data.batch_size.
    # How the stage-2 MegaDepth recipe's B=32 fits one v5e chip (B=8 is
    # the largest direct fit at 1024^2/2048kpts — ROADMAP round-5 perf log)
    "grad_accumulation": 1,
    # on-device synthetic-pair generation (data/device_homography.py): the
    # loader streams source images only (data.emit_source: true); warps +
    # photometric jitter run inside the train step
    "device_augment": None,  # e.g. {name: homography, patch_size: [640, 480]}
    "log_grad_every_iter": None,  # log gradient-norm histograms
    "plot": None,  # [every_n_evals, "dotted.path.to.figure_fn"]
    "run_benchmarks": [],  # benchmark names to run per epoch (e.g. ["hpatches"])
    "benchmark_conf": {},  # per-benchmark conf overrides
}

default_conf = {"data": {}, "model": {}, "train": default_train_conf}


# ---------------------------------------------------------------------------
# optimizer construction
# ---------------------------------------------------------------------------


def param_path_strings(params) -> dict:
    """Map each leaf path to a '/'-joined string tree of the same structure."""
    flat = jax.tree_util.tree_flatten_with_path(params)[0]
    treedef = jax.tree_util.tree_structure(params)
    labels = [
        "/".join(str(getattr(k, "key", getattr(k, "idx", k))) for k in path)
        for path, _ in flat
    ]
    return jax.tree_util.tree_unflatten(treedef, labels)


def get_frozen_components(model) -> set:
    """Submodule names of pipeline components with trainable: False."""
    frozen = set()
    for comp in getattr(model, "components", []):
        comp_conf = model.conf.get(comp)
        if comp_conf and comp_conf.get("name") and not comp_conf.get("trainable", True):
            frozen.add(f"{comp}_model")
    return frozen


def _apply_one_schedule(sconf, conf, steps_per_epoch, step, epoch, lr):
    """Multiplier of ONE schedule conf onto the running lr."""
    stype = sconf.get("type")
    if stype in (None, "none"):
        return lr
    # unit: "epoch" (default, reference semantics) or "iter" — with "iter"
    # `start`/`exp_div_10`/`on_epoch` count optimizer steps, so the
    # reference's per-iteration step counts (e.g. GlueStick's 200k-step exp
    # decay) can be used directly without the batch-size/train-size coupling.
    t = step if sconf.get("unit", "epoch") == "iter" else epoch
    if stype == "exp":
        gam = 10.0 ** (-1.0 / max(sconf.get("exp_div_10", 0) or 1e-9, 1e-9))
        e = jnp.maximum(t - sconf.get("start", 0), 0.0)
        return lr * gam**e
    if stype == "factor":
        on = jnp.asarray(list(sconf.get("on_epoch") or []), jnp.float32)
        if on.size:
            n = (t[None] >= on).sum() if jnp.ndim(t) else (t >= on).sum()
            return lr * sconf.get("factor", 1.0) ** n
        return lr
    if stype == "cosine":
        total = conf.epochs * steps_per_epoch
        return lr * 0.5 * (
            1 + jnp.cos(jnp.pi * jnp.minimum(step / max(total, 1), 1.0))
        )
    # arbitrary schedule: a dotted path to fn(step, epoch, lr, conf) -> lr
    # (role of the reference accepting any torch.optim.lr_scheduler class
    # by name, train.py:144-174)
    import pydoc

    fn = pydoc.locate(str(stype))
    if fn is None:
        raise ValueError(f"unknown lr schedule type or path: {stype!r}")
    return fn(step, epoch, lr, sconf)


def build_lr_schedule(conf, steps_per_epoch: int):
    """Epoch-based schedules matching reference `get_lr_scheduler`
    (`train.py:144-174`): exp decay of 10x per `exp_div_10` epochs starting
    at `start`, discrete `factor` multiplications at epochs in `on_epoch`,
    cosine, or any dotted-path callable. `lr_schedule` may also be a LIST of
    schedule confs, composed multiplicatively (role of the reference's
    ChainedScheduler support)."""
    sconf = conf.lr_schedule
    chain = list(sconf) if isinstance(sconf, (list, tuple)) else [sconf]
    base = conf.lr

    def schedule(step):
        # steps_per_epoch may be FRACTIONAL (real updates per epoch under
        # grad_accumulation can be < 1 for tiny loaders)
        epoch = step / max(steps_per_epoch, 1e-9)
        lr = jnp.asarray(base, jnp.float32)
        for sc in chain:
            lr = _apply_one_schedule(sc, conf, steps_per_epoch, step, epoch, lr)
        return lr

    return schedule


def build_optimizer(conf, params, model, steps_per_epoch: int):
    accum = int(conf.get("grad_accumulation") or 1)
    # with gradient accumulation, optax advances the schedule once per REAL
    # update (optax.MultiSteps), i.e. steps_per_epoch/accum times per data
    # epoch — build the schedule in that (possibly fractional) unit or
    # epoch-based decays would run accum-times too slowly
    schedule = build_lr_schedule(conf, steps_per_epoch / accum)
    opts = dict(conf.optimizer_options or {})
    if conf.optimizer == "adam":
        opt = optax.adam(schedule, **opts)
    elif conf.optimizer == "adamw":
        opt = optax.adamw(schedule, **opts)
    elif conf.optimizer == "sgd":
        opt = optax.sgd(schedule, **opts)
    elif conf.optimizer == "rmsprop":
        opt = optax.rmsprop(schedule, **opts)
    else:
        raise ValueError(f"unknown optimizer {conf.optimizer}")
    chain = []
    if conf.clip_grad is not None:
        chain.append(optax.clip_by_global_norm(conf.clip_grad))
    chain.append(opt)
    tx = optax.chain(*chain)

    # freeze non-trainable components + opt_regexp filtering
    frozen = get_frozen_components(model)
    regexp = re.compile(conf.opt_regexp) if conf.opt_regexp else None
    paths = param_path_strings(params)

    def label(path: str):
        top = path.split("/")[0]
        if top in frozen:
            return "freeze"
        if regexp is not None and not regexp.search(path):
            return "freeze"
        return "train"

    labels = jax.tree.map(label, paths)
    tx = optax.multi_transform({"train": tx, "freeze": optax.set_to_zero()}, labels)
    if accum > 1:
        # outermost so freezing/clipping see the accumulated (averaged) grads;
        # the lr schedule advances once per real update, not per micro-step
        tx = optax.MultiSteps(tx, every_k_schedule=accum)
    n_train = sum(jax.tree.leaves(jax.tree.map(lambda s: s == "train", labels)))
    n_total = len(jax.tree.leaves(labels))
    logger.info("Optimizer: %d/%d parameter tensors trainable", n_train, n_total)
    # the returned schedule is for LOGGING and takes MICRO-step counts —
    # the accum->real-update conversion lives here, in one place, mirroring
    # how optax.MultiSteps advances the inner schedule
    log_schedule = (lambda micro: schedule(micro // accum)) if accum > 1 else schedule
    return tx, log_schedule


# ---------------------------------------------------------------------------
# batch device placement
# ---------------------------------------------------------------------------


def strip_non_arrays(batch):
    """Remove string/object leaves that can't go to device."""
    if isinstance(batch, dict):
        out = {}
        for k, v in batch.items():
            if isinstance(v, dict):
                out[k] = strip_non_arrays(v)
            elif isinstance(v, (str, bytes)) or (isinstance(v, list) and v and isinstance(v[0], str)):
                continue
            else:
                out[k] = v
        return out
    return batch


def shard_batch(batch, mesh: Mesh, axis: int = 0):
    """device_put every array leaf sharded over the mesh's data axis.
    `axis` selects which array dimension is the batch dimension (1 for
    stacked multi-step super-batches of shape (k, B, ...)).

    Multi-host: each process passes its LOCAL batch shard (from the
    distributed data loader); the leaves are assembled into global arrays
    spanning the full mesh via `make_array_from_process_local_data` — the
    pjit step then runs SPMD with gradient reductions riding ICI/DCN
    (SURVEY §5.8 rebuild mapping)."""
    data_sharding = NamedSharding(mesh, P(*([None] * axis + ["data"])))
    scalar_sharding = NamedSharding(mesh, P())
    nproc = jax.process_count()

    def put(x):
        x = np.asarray(x) if not isinstance(x, jnp.ndarray) else x
        if nproc > 1:
            if (
                getattr(x, "ndim", 0) > axis
                and (x.shape[axis] * nproc) % mesh.size == 0
            ):
                return jax.make_array_from_process_local_data(data_sharding, x)
            return jax.make_array_from_process_local_data(scalar_sharding, x)
        if getattr(x, "ndim", 0) > axis and x.shape[axis] % mesh.size == 0:
            return jax.device_put(x, data_sharding)
        return jax.device_put(x, scalar_sharding)

    return map_tensor(batch, put)


def make_mesh(n_devices: int | None = None) -> Mesh:
    """1-D data-parallel mesh over all devices.

    On multi-slice pods (devices spread across DCN-connected slices) the
    device order is built slice-major via `create_hybrid_device_mesh`, so
    XLA's hierarchical all-reduce does the big reductions over ICI within a
    slice and only the cross-slice combine over DCN (SURVEY §2.10 rebuild
    mapping / §5.8)."""
    devices = jax.devices()[: n_devices or len(jax.devices())]
    num_slices = len({getattr(d, "slice_index", 0) for d in devices})
    if n_devices is None and num_slices > 1:
        try:
            from jax.experimental import mesh_utils

            per_slice = len(devices) // num_slices
            dev_mesh = mesh_utils.create_hybrid_device_mesh(
                (per_slice,), (num_slices,), devices=devices
            )
            return Mesh(dev_mesh.reshape(-1), ("data",))
        except Exception as e:  # pragma: no cover - topology-dependent
            logger.warning("hybrid mesh construction failed (%s); flat order", e)
    return Mesh(np.asarray(devices), ("data",))


# ---------------------------------------------------------------------------
# training
# ---------------------------------------------------------------------------


class SigIntHandler:
    """Graceful stop on SIGINT (reference `train.py:322-330`)."""

    def __init__(self):
        self.stop = False
        self._prev = None

    def __enter__(self):
        def handler(sig, frame):
            if self.stop:
                raise KeyboardInterrupt
            logger.info("SIGINT: will stop after this iteration (again to kill).")
            self.stop = True

        self._prev = signal.signal(signal.SIGINT, handler)
        return self

    def __exit__(self, *a):
        signal.signal(signal.SIGINT, self._prev)


def make_train_step(model, tx, mixed_precision=None, device_augment=None):
    def train_step(variables, opt_state, batch, rng):
        params = variables["params"]
        extra = {k: v for k, v in variables.items() if k != "params"}

        if device_augment and "source_image" in batch:
            rng, aug_rng = jax.random.split(rng)
            batch = apply_device_augment(batch, aug_rng, device_augment)

        def loss_fn(p):
            p_fwd = p
            fwd_batch = batch
            if mixed_precision == "bf16":
                to_bf16 = (
                    lambda x: x.astype(jnp.bfloat16)
                    if isinstance(x, jnp.ndarray) and x.dtype == jnp.float32
                    else x
                )
                p_fwd = jax.tree.map(to_bf16, p)
                # cast image inputs too — casting params alone is useless
                # (fp32 activations promote everything back to fp32)
                fwd_batch = dict(batch)
                for view in ("view0", "view1", "view2"):
                    if view in fwd_batch and "image" in fwd_batch[view]:
                        fwd_batch[view] = dict(fwd_batch[view])
                        fwd_batch[view]["image"] = to_bf16(fwd_batch[view]["image"])
            outs, updates = model.apply(
                {"params": p_fwd, **extra},
                fwd_batch,
                method="forward_with_loss",
                mutable=["batch_stats"],
                rngs={"sample": rng},
            )
            pred, losses, metrics = outs
            return losses["total"].mean(), (losses, metrics, updates)

        (loss, (losses, metrics, updates)), grads = jax.value_and_grad(
            loss_fn, has_aux=True
        )(params)
        grads = jax.tree.map(lambda g: g.astype(jnp.float32), grads)
        safe_grads = jax.tree.map(lambda g: jnp.where(jnp.isfinite(g).all(), g, 0.0), grads)
        updates_opt, new_opt_state = tx.update(safe_grads, opt_state, params)
        new_params = optax.apply_updates(params, updates_opt)
        # skip the whole update on non-finite loss OR non-finite updated
        # params (reference train.py:477-515 NaN-skip + error_if_nonfinite) —
        # a finite-loss step can still blow params up; without the post-check
        # the poisoned params freeze the run permanently
        params_ok = jax.tree_util.tree_reduce(
            jnp.logical_and,
            jax.tree.map(lambda a: jnp.isfinite(a).all(), new_params),
            jnp.bool_(True),
        )
        ok = jnp.isfinite(loss) & params_ok
        new_params = jax.tree.map(lambda a, b: jnp.where(ok, a, b), new_params, params)
        new_opt_state = jax.tree.map(
            lambda a, b: jnp.where(ok, a, b) if isinstance(a, jnp.ndarray) else a,
            new_opt_state,
            opt_state,
        )
        new_variables = {"params": new_params, **updates}
        if "batch_stats" in variables and "batch_stats" not in new_variables:
            new_variables["batch_stats"] = variables["batch_stats"]
        losses = {k: v.mean() for k, v in losses.items()}
        metrics = {k: v.mean() for k, v in metrics.items()}
        gnorm = optax.global_norm(grads)
        return new_variables, new_opt_state, losses, metrics, {"grad_norm": gnorm, "ok": ok}

    return train_step


def make_multi_step(train_step, k: int):
    """Chain k optimizer steps in one dispatch via lax.scan over a stacked
    batch pytree (leading axis k). Returns last-step losses/metrics."""

    def multi_step(variables, opt_state, stacked_batch, rng):
        def body(carry, inp):
            variables, opt_state = carry
            batch_i, rng_i = inp
            variables, opt_state, losses, metrics, info = train_step(
                variables, opt_state, batch_i, rng_i
            )
            return (variables, opt_state), (losses, metrics, info)

        rngs = jax.random.split(rng, k)
        (variables, opt_state), (losses, metrics, info) = jax.lax.scan(
            body, (variables, opt_state), (stacked_batch, rngs)
        )
        last = lambda tree: jax.tree.map(lambda x: x[-1], tree)
        return variables, opt_state, last(losses), last(metrics), last(info)

    return multi_step


def stack_batches(batches: list):
    """Stack a list of same-structure batches along a new leading axis."""
    import numpy as _np

    return jax.tree.map(lambda *xs: _np.stack(xs, axis=0), *batches)


def apply_device_augment(batch, rng, device_augment):
    from .data.device_homography import generate_homography_pairs

    gen = generate_homography_pairs(
        batch["source_image"],
        rng,
        patch_size=tuple(device_augment.get("patch_size", (640, 480))),
        difficulty=device_augment.get("difficulty", 0.5),
        translation=device_augment.get("translation", 1.0),
        photometric_strength=device_augment.get("photometric_strength", 0.5),
        n_angles=device_augment.get("n_angles", 10),
        max_angle=device_augment.get("max_angle", 90.0),
    )
    return {**{k: v for k, v in batch.items() if k != "source_image"}, **gen}


def make_eval_step(model, device_augment=None, pr_curves=None):
    """Validation step: eval-mode loss + metrics (`train=False` — reference
    `do_evaluation` runs under `model.eval()`), plus the per-element
    (labels, predictions, mask) slices requested by `conf.train.pr_curves`
    (reference train.py:96-101) so PR accumulation stays off-device."""

    def eval_step(variables, batch, rng):
        if device_augment and "source_image" in batch:
            batch = apply_device_augment(batch, jax.random.fold_in(rng, 7), device_augment)
        outs, _ = model.apply(
            variables,
            batch,
            train=False,
            method="forward_with_loss",
            mutable=["batch_stats"],
            rngs={"sample": rng},
        )
        pred, losses, metrics = outs
        pr_slices = {}
        for name, spec in (pr_curves or {}).items():
            pr_slices[name] = (
                pred[spec["labels"]],
                pred[spec["predictions"]],
                pred[spec["mask"]] if "mask" in spec else None,
            )
        return losses, metrics, pr_slices

    return eval_step


def do_evaluation(eval_step_fn, variables, loader, conf, mesh, rng, max_iters=None):
    """Validation loop with streaming accumulators (reference `train.py:78-122`).

    Returns `(results, pr_metrics)` where `pr_metrics[name]` is the
    `(labels, predictions)` arrays accumulated by a `PRMetric`."""
    results = defaultdict(list)
    accums = {}
    pr_accums = defaultdict(PRMetric)
    for i, batch in enumerate(loader):
        if max_iters is not None and i >= max_iters:
            break
        batch = shard_batch(strip_non_arrays(prepare_batch(batch)), mesh)
        losses, metrics, pr_slices = eval_step_fn(variables, batch, rng)
        for name, (labels, predictions, mask) in pr_slices.items():
            pr_accums[name].update(
                np.asarray(labels),
                np.asarray(predictions),
                mask=np.asarray(mask) if mask is not None else None,
            )
        numbers = {
            **{f"loss/{k}": np.asarray(v) for k, v in losses.items()},
            **{k: np.asarray(v) for k, v in metrics.items()},
        }
        for k, v in numbers.items():
            if k not in accums:
                if k in conf.median_metrics:
                    accums[k] = MedianMetric()
                elif k in conf.recall_metrics:
                    accums[k] = RecallMetric(conf.recall_metrics[k])
                else:
                    accums[k] = AverageMetric()
                if k in conf.median_metrics:
                    accums[k + "_median"] = MedianMetric()
            accums[k].update(v)
            if k + "_median" in accums:
                accums[k + "_median"].update(v)
    return (
        {k: m.compute() for k, m in accums.items()},
        {k: m.compute() for k, m in pr_accums.items()},
    )


def training(conf: Config, output_dir: Path, args):
    output_dir = Path(output_dir)
    output_dir.mkdir(parents=True, exist_ok=True)

    rng_key = set_seed(conf.train.seed)
    # multi-host: exactly one process owns filesystem side effects
    # (checkpoints, tensorboard, benchmarks, snapshots) — reference
    # train.py:407-429,592-635 gates the same set on rank 0
    is_main = jax.process_index() == 0
    writer = None
    if not args.no_tensorboard and is_main:
        try:
            from tensorboardX import SummaryWriter

            writer = SummaryWriter(str(output_dir))
        except ImportError:
            pass

    # data -----------------------------------------------------------------
    data_conf = conf.data
    dataset = get_dataset(data_conf.name)(data_conf)
    if args.overfit:
        train_loader = dataset.get_overfit_loader("train")
        val_loader = dataset.get_overfit_loader("val")
    else:
        # multi-host: each process loads its 1/num_processes dataset shard
        # (role of the reference's DistributedSampler, base_dataset.py:166-169)
        dist = jax.process_count() > 1
        train_loader = dataset.get_data_loader("train", distributed=dist)
        val_loader = dataset.get_data_loader("val", distributed=dist)
    steps_per_epoch = max(len(train_loader), 1)
    logger.info("Training loader has %d batches", steps_per_epoch)

    # mesh -----------------------------------------------------------------
    mesh = make_mesh(args.n_devices)
    logger.info("Mesh: %d devices (%s)", mesh.size, mesh.devices.ravel()[0].platform)

    # model ----------------------------------------------------------------
    model_conf = conf.model
    model = get_model(model_conf.name).from_conf(
        {k: v for k, v in model_conf.to_dict().items() if k != "name"}
    )

    init_batch = next(iter(train_loader))
    init_batch_dev = strip_non_arrays(prepare_batch(init_batch))
    if conf.train.device_augment and "source_image" in init_batch_dev:
        init_batch_dev = apply_device_augment(
            {k: jnp.asarray(v) if not isinstance(v, jnp.ndarray) else v
             for k, v in init_batch_dev.items()},
            jax.random.key(0),
            conf.train.device_augment,
        )
    init_rng, sample_rng, rng_key = jax.random.split(rng_key, 3)
    # local_devices: in multi-process runs jax.devices()[0] is process 0's
    # device — non-addressable elsewhere (placing init there segfaults the
    # CPU client on other processes)
    with jax.default_device(jax.local_devices()[0]):
        variables = model.init(
            {"params": init_rng, "sample": sample_rng}, init_batch_dev, method="initialize"
        )
    variables = dict(variables)
    n_params = sum(int(np.prod(p.shape)) for p in jax.tree.leaves(variables["params"]))
    logger.info("Model has %.2fM parameters", n_params / 1e6)

    # optional warm start / restore ---------------------------------------
    epoch0, iter0, best_eval = 0, 0, None
    tx, schedule = build_optimizer(conf.train, variables["params"], model, steps_per_epoch)
    opt_state = tx.init(variables["params"])
    if args.restore:
        ckpt_path = get_last_checkpoint(output_dir.name)
        payload = load_checkpoint(ckpt_path, {"params": variables["params"], "batch_stats": variables.get("batch_stats", {}), "opt_state": opt_state})
        variables["params"] = payload["state"]["params"]
        if payload["state"].get("batch_stats"):
            variables["batch_stats"] = payload["state"]["batch_stats"]
        opt_state = payload["state"]["opt_state"]
        epoch0 = payload["epoch"] + 1
        logger.info("Restored from %s at epoch %d", ckpt_path, epoch0)
    elif conf.train.load_experiment:
        from .utils.experiments import get_best_checkpoint

        ckpt_path = get_best_checkpoint(conf.train.load_experiment)
        payload = load_checkpoint(ckpt_path)
        from flax import serialization as _ser

        variables["params"] = _ser.from_state_dict(
            variables["params"], payload["state"]["params"]
        )
        logger.info("Warm-started from experiment %s", conf.train.load_experiment)

    # jitted steps ---------------------------------------------------------
    # NOTE: no donate_argnums — buffer donation is unsupported/unreliable
    # through relayed PJRT backends; revisit for real pods (memory win only).
    k_steps = max(int(conf.train.steps_per_dispatch), 1)
    base_step = make_train_step(
        model, tx, conf.train.mixed_precision, conf.train.device_augment
    )
    if k_steps > 1:
        train_step = jax.jit(make_multi_step(base_step, k_steps))
    else:
        train_step = jax.jit(base_step)
    # replicated outputs: per-element metric/PR arrays are batch-sharded over
    # the global mesh; the epoch-end accumulators run on the host, and on
    # multi-host a process can only fetch fully-replicated global arrays —
    # this out_sharding compiles the all-gather into the eval step
    eval_step = jax.jit(
        make_eval_step(
            model,
            conf.train.device_augment,
            pr_curves=(conf.train.pr_curves or {}),
        ),
        out_shardings=NamedSharding(mesh, P()),
    )

    # save resolved conf + a source snapshot for reproducibility
    # (role of reference train.py:723-726 module-source snapshotting)
    if is_main:
        with open(output_dir / "config.yaml", "w") as f:
            f.write(conf.to_yaml())
        try:
            import shutil

            pkg_dir = Path(__file__).parent
            shutil.make_archive(str(output_dir / "source_snapshot"), "gztar", pkg_dir)
        except Exception as e:
            logger.warning("source snapshot failed: %s", e)

    total_iter = iter0
    stop = False
    results: dict = {}
    train_bs = dataset.batch_size("train")
    with SigIntHandler() as sig:
        for epoch in range(epoch0, conf.train.epochs):
            if stop:
                break
            # per-epoch dataset resampling hook (reference train.py:443-455);
            # the recreated loader must stay distributed (per-host shards)
            cb = conf.train.dataset_callback_fn
            if cb and hasattr(dataset, cb):
                getattr(dataset, cb)(conf.train.seed + epoch)
                train_loader = dataset.get_data_loader(
                    "train", distributed=not args.overfit and jax.process_count() > 1
                )
            dataset.epoch = epoch
            # new shuffle permutation per epoch for distributed samplers
            # (reference train.py:441-442)
            sampler = getattr(train_loader, "sampler", None)
            if hasattr(sampler, "set_epoch"):
                sampler.set_epoch(epoch)

            t_start = time.time()
            n_samples = 0
            pending: list = []
            for it, batch in enumerate(train_loader):
                if k_steps > 1:
                    pending.append(strip_non_arrays(prepare_batch(batch)))
                    if len(pending) < k_steps and it < len(train_loader) - 1:
                        continue
                    # pad the tail by repeating the last batch
                    while len(pending) < k_steps:
                        pending.append(pending[-1])
                    batch_dev = shard_batch(stack_batches(pending), mesh, axis=1)
                    pending = []
                else:
                    batch_dev = shard_batch(strip_non_arrays(prepare_batch(batch)), mesh)
                step_rng = jax.random.fold_in(rng_key, total_iter)
                # pure dispatch -> safe to re-issue on transient relay errors
                variables, opt_state, losses, metrics, info = retry_transient(
                    train_step, variables, opt_state, batch_dev, step_rng
                )
                n_samples += train_bs * k_steps
                # with dispatch grouping (k_steps > 1) this code only runs on
                # iterations it = k-1, 2k-1, ... — fire once per
                # log_every_iter window instead of requiring it % log == 0
                # (which never holds when log_every_iter is a multiple of k)
                if it % conf.train.log_every_iter < k_steps:
                    losses_np = retry_transient(
                        lambda: {k: float(v) for k, v in losses.items()}
                    )
                    # the logging schedule takes MICRO-steps (it owns the
                    # grad_accumulation conversion); total_iter counts
                    # dispatches of k_steps micro-steps each
                    lr = float(schedule(total_iter * k_steps))
                    sps = n_samples / (time.time() - t_start + 1e-9)
                    logger.info(
                        "[E %d | it %d] loss {%s} lr %.2e %.1f samples/s",
                        epoch,
                        it,
                        ", ".join(f"{k} {v:.3f}" for k, v in losses_np.items()),
                        lr,
                        sps,
                    )
                    if writer:
                        x = total_iter if conf.train.log_it else total_iter * (
                            dataset.batch_size("train")
                        )
                        for k, v in losses_np.items():
                            writer.add_scalar(f"training/loss/{k}", v, x)
                        writer.add_scalar("training/lr", lr, x)
                        writer.add_scalar("training/grad_norm", float(info["grad_norm"]), x)
                        writer.add_scalar("training/samples_per_sec", sps, x)

                if (
                    conf.train.log_grad_every_iter
                    and total_iter % conf.train.log_grad_every_iter == 0
                    and writer
                ):
                    # gradient norm histogram over parameter tensors
                    # (role of reference train.py:546-558)
                    writer.add_scalar(
                        "training/grad_global_norm", float(info["grad_norm"]), total_iter
                    )

                do_eval = (
                    total_iter % conf.train.eval_every_iter == 0 and total_iter > 0
                ) or it == len(train_loader) - 1
                if do_eval:
                    results, pr_results = do_evaluation(
                        eval_step, variables, val_loader, conf.train, mesh, rng_key,
                        max_iters=args.max_val_iters,
                    )
                    str_results = ", ".join(
                        f"{k} {v:.4f}" for k, v in results.items() if np.isscalar(v)
                    )
                    logger.info("[Validation] {%s}", str_results)
                    if writer:
                        for k, v in results.items():
                            if np.isscalar(v):
                                writer.add_scalar(f"val/{k}", float(v), total_iter)
                        # PR curves (reference train.py:589 writes the
                        # accumulated (labels, predictions) tuples)
                        for k, (labels, predictions) in pr_results.items():
                            if len(labels):
                                writer.add_pr_curve(
                                    f"val/{k}", labels, predictions, total_iter
                                )
                    # train-time figure hook (reference conf `plot:` entries)
                    if conf.train.plot and writer:
                        import pydoc

                        every, fn_path = conf.train.plot
                        if (total_iter // max(conf.train.eval_every_iter, 1)) % every == 0:
                            fig_fn = pydoc.locate(str(fn_path))
                            if fig_fn is not None:
                                try:
                                    pred_v = model.apply(
                                        variables, batch_dev, train=True,
                                        rngs={"sample": step_rng},
                                        mutable=["batch_stats"],
                                    )[0]
                                    figs = fig_fn(pred_v, batch_dev)
                                    for fname, fig in figs.items():
                                        writer.add_figure(
                                            f"figures/{fname}", fig, total_iter
                                        )
                                except Exception as e:  # plotting must never kill training
                                    logger.warning("plot hook failed: %s", e)

                if stop or sig.stop:
                    stop = True
                    break
                total_iter += 1

            # per-epoch benchmark runs (reference train.py:409-429; rank 0)
            for bench_name in (conf.train.run_benchmarks or []) if is_main else []:
                try:
                    from .eval import run_benchmark

                    bench_conf = dict(conf.train.benchmark_conf.get(bench_name, {}))
                    s, _, _ = run_benchmark(
                        bench_name, bench_conf, output_dir / "benchmarks" / bench_name,
                        model=model, variables=variables,
                    )
                    logger.info("[Benchmark %s] %s", bench_name, s)
                    if writer:
                        for k, v in s.items():
                            if np.isscalar(v) and not isinstance(v, str):
                                writer.add_scalar(
                                    f"benchmark/{bench_name}/{k}", float(v), total_iter
                                )
                except Exception as e:
                    logger.warning("benchmark %s failed: %s", bench_name, e)

            # end of epoch: checkpoint — only the main process writes
            # (params are replicated; concurrent writers on shared storage
            # would race, reference train.py:592-635)
            if is_main:
                state = {
                    "params": variables["params"],
                    "batch_stats": variables.get("batch_stats", {}),
                    "opt_state": opt_state,
                }
                results_scalar = {k: v for k, v in results.items() if np.isscalar(v)}
                path = save_checkpoint(
                    state, conf, results_scalar, output_dir, epoch, total_iter,
                    interrupted=stop and sig.stop,
                )
                best_eval = update_best_checkpoint(
                    path, results_scalar, conf.train.best_key, best_eval
                )
                delete_old_checkpoints(output_dir, conf.train.keep_last_checkpoints)

    logger.info("Finished training.")
    if writer:
        writer.close()
    return variables


def main_args(argv=None):
    parser = argparse.ArgumentParser()
    parser.add_argument("experiment", type=str)
    parser.add_argument("--conf", type=str, default=None)
    parser.add_argument("--overfit", action="store_true")
    parser.add_argument("--restore", action="store_true")
    parser.add_argument("--no_tensorboard", action="store_true")
    parser.add_argument("--n_devices", type=int, default=None)
    parser.add_argument("--max_val_iters", type=int, default=None)
    parser.add_argument("--detect_anomaly", action="store_true")
    parser.add_argument("--profile", action="store_true")
    parser.add_argument("--no_capture", action="store_true")
    parser.add_argument("dotlist", nargs="*")
    return parser.parse_intermixed_args(argv)


def main(argv=None):
    args = main_args(argv)
    conf = Config(default_conf)
    if args.conf:
        conf = merge(conf, from_yaml(args.conf))
    if args.dotlist:
        conf = merge(conf, from_dotlist(args.dotlist))
    if args.detect_anomaly:
        # role of torch.autograd.set_detect_anomaly (reference train.py:344)
        jax.config.update("jax_debug_nans", True)
    output_dir = Path(TRAINING_PATH, args.experiment)
    output_dir.mkdir(parents=True, exist_ok=True)

    import contextlib

    capture = contextlib.nullcontext()
    if not args.no_capture and jax.process_index() == 0:
        from .utils.stdout_capturing import capture_outputs

        capture = capture_outputs(output_dir / "log.txt")

    profiler = contextlib.nullcontext()
    if args.profile:
        # role of torch.profiler (reference train.py:389-404): xprof trace
        profiler = jax.profiler.trace(str(output_dir / "profile"))

    with capture, profiler:
        return training(conf, output_dir, args)


if __name__ == "__main__":
    main()

"""Checkpoint management (role of reference `utils/experiments.py:22-134`).

Checkpoints are flax state-dict msgpack files holding params, batch stats,
optimizer state, conf, epoch/iter and eval results — same semantics as the
reference's torch tars: `checkpoint_{epoch}_{iter}[_interrupted].msgpack`,
best copied to `checkpoint_best.msgpack`, keep-last-N retention.
"""

from __future__ import annotations

import json
import re
import shutil
from pathlib import Path

import numpy as np
from flax import serialization

from .. import logger
from ..core.config import Config, from_yaml, merge
from ..settings import TRAINING_PATH


def list_checkpoints(dir_: Path) -> list:
    """Sorted [(epoch, iter, path)] of all checkpoints in a directory."""
    checkpoints = []
    for p in dir_.glob("checkpoint_*.msgpack"):
        m = re.match(r"checkpoint_(\d+)_(\d+)(_interrupted)?\.msgpack", p.name)
        if m:
            checkpoints.append(((int(m.group(1)), int(m.group(2))), p))
    return sorted(checkpoints, key=lambda x: x[0])


def get_last_checkpoint(exper, allow_interrupted: bool = True) -> Path:
    ckpts = list_checkpoints(Path(TRAINING_PATH, exper))
    if not allow_interrupted:
        ckpts = [(k, p) for (k, p) in ckpts if "_interrupted" not in p.name]
    if not ckpts:
        raise FileNotFoundError(f"no checkpoint in experiment {exper}")
    return ckpts[-1][1]


def get_best_checkpoint(exper) -> Path:
    p = Path(TRAINING_PATH, exper, "checkpoint_best.msgpack")
    if not p.exists():
        raise FileNotFoundError(f"no best checkpoint in experiment {exper}")
    return p


def delete_old_checkpoints(dir_: Path, num_keep: int):
    ckpts = list_checkpoints(dir_)
    for _, p in ckpts[: max(len(ckpts) - num_keep, 0)]:
        logger.info("Deleting checkpoint %s", p.name)
        p.unlink()


def _to_numpy_tree(tree):
    import jax

    return jax.tree.map(lambda x: np.asarray(x), tree)


def save_checkpoint(
    state: dict,
    conf,
    results: dict,
    output_dir: Path,
    epoch: int,
    iter_i: int,
    interrupted: bool = False,
    best_eval=None,
    cp_name: str | None = None,
) -> Path | None:
    """Serialize a training state. `state` is a dict of pytrees
    (params / batch_stats / opt_state / step...). Returns new best_eval."""
    output_dir = Path(output_dir)
    if cp_name is None:
        cp_name = f"checkpoint_{epoch}_{iter_i}" + ("_interrupted" if interrupted else "") + ".msgpack"
    logger.info("Saving checkpoint %s", cp_name)
    payload = {
        "state": serialization.to_state_dict(_to_numpy_tree(state)),
        "epoch": epoch,
        "iter": iter_i,
        "eval": serialization.to_state_dict(_to_numpy_tree(results or {})),
    }
    path = output_dir / cp_name
    with open(path, "wb") as f:
        f.write(serialization.msgpack_serialize(payload))
    with open(output_dir / "config.yaml", "w") as f:
        f.write(Config(conf).to_yaml() if not isinstance(conf, Config) else conf.to_yaml())
    with open(output_dir / f"eval_{epoch}_{iter_i}.json", "w") as f:
        json.dump({k: float(v) for k, v in (results or {}).items() if np.isscalar(v) or getattr(v, "ndim", 1) == 0}, f, indent=2)
    return path


def update_best_checkpoint(path: Path, results: dict, best_key: str, best_eval):
    """Copy to checkpoint_best if `best_key` improved (lower is better)."""
    if results is None or best_key not in results:
        return best_eval
    value = float(results[best_key])
    if best_eval is None or value < best_eval:
        logger.info("New best checkpoint: %s=%s", best_key, value)
        shutil.copy(path, path.parent / "checkpoint_best.msgpack")
        return value
    return best_eval


def load_checkpoint(path: Path, state_template=None) -> dict:
    """Load a checkpoint. With `state_template` (matching pytree of arrays),
    restores exact types; otherwise returns raw nested dicts."""
    with open(path, "rb") as f:
        payload = serialization.msgpack_restore(f.read())
    if state_template is not None:
        payload["state"] = serialization.from_state_dict(state_template, payload["state"])
    return payload


def load_experiment(exper, conf=None, get_last=False, ckpt=None):
    """Load the model (pipeline) + variables of a completed experiment
    (role of reference `utils/experiments.py:65-93`). Returns
    (model, variables, full_conf)."""
    from ..models import get_model

    if ckpt is None:
        ckpt = get_last_checkpoint(exper) if get_last else get_best_checkpoint(exper)
    exper_dir = Path(TRAINING_PATH, exper) if not Path(exper).exists() else Path(exper)
    saved_conf = from_yaml(str(exper_dir / "config.yaml"))
    full_conf = merge(saved_conf, conf or {})
    model_conf = full_conf.model
    model = get_model(model_conf.name).from_conf(
        {k: v for k, v in model_conf.to_dict().items() if k != "name"}
    )
    payload = load_checkpoint(ckpt)
    state = payload["state"]
    variables = {"params": state["params"]}
    if state.get("batch_stats"):
        variables["batch_stats"] = state["batch_stats"]
    return model, variables, full_conf

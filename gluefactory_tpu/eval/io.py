"""Eval config/CLI parsing (role of reference `eval/io.py:14-110`).

Named configs resolve from `gluefactory_tpu/configs/*.yaml`; per-benchmark
sub-confs under `benchmarks.<name>`; merge order default < conf < checkpoint
< CLI dotlist.
"""

from __future__ import annotations

import argparse
from pathlib import Path
from pprint import pprint

import jax
import numpy as np

from .. import logger
from ..core.config import Config, from_dotlist, from_yaml, merge
from ..models import get_model
from ..settings import TRAINING_PATH


def parse_config_path(name_or_path: str, defaults: str = "configs/") -> Path:
    default_configs = {}
    default_dir = Path(__file__).parent.parent / defaults
    for p in default_dir.glob("**/*.yaml"):
        default_configs[p.stem] = p
    if name_or_path in default_configs:
        return default_configs[name_or_path]
    path = Path(name_or_path)
    if not path.exists():
        raise ValueError(
            f"Cannot find the config file: {name_or_path}. "
            f"Not in the default configs {list(default_configs.keys())}"
        )
    return path


def extract_benchmark_conf(conf: Config, benchmark: str) -> Config:
    """Merge the model conf with `benchmarks.<name>` sub-conf
    (reference `eval/io.py:35-44`)."""
    mconf = Config({"model": conf.get("model", {})})
    if "benchmarks" in conf:
        return merge(mconf, conf.benchmarks.get(benchmark, {}))
    return mconf


def parse_eval_args(benchmark: str, args, configs_path: str, default=None):
    """Parse eval CLI args into (name, conf) (reference `eval/io.py:47-85`)."""
    conf = Config({"data": {}, "model": {}, "eval": {}})
    if args.conf:
        conf_path = parse_config_path(args.conf, configs_path)
        custom_conf = from_yaml(str(conf_path))
        conf = merge(conf, extract_benchmark_conf(custom_conf, benchmark))
        args.tag = args.tag if args.tag is not None else conf_path.stem

    cli_conf = from_dotlist(args.dotlist) if args.dotlist else Config({})
    conf = merge(conf, cli_conf)
    conf = conf.set("checkpoint", args.checkpoint or conf.get("checkpoint"))

    if conf.get("checkpoint") and not conf.checkpoint.endswith(".msgpack"):
        ckpt_path = Path(TRAINING_PATH) / conf.checkpoint
        if (ckpt_path / "config.yaml").exists():
            ckpt_conf = from_yaml(str(ckpt_path / "config.yaml"))
            conf = merge(Config({"model": ckpt_conf.get("model", {})}), conf)
    if default is not None:
        conf = merge(Config(default), conf)
    name = args.tag or args.checkpoint or "default"
    if len(args.dotlist) > 0 and not args.tag:
        name = name + "_" + ":".join(args.dotlist)
    logger.info("Running benchmark: %s", benchmark)
    logger.info("Experiment tag: %s", name)
    logger.info("Config:")
    pprint(conf.to_dict())
    return name, conf


def get_eval_parser():
    parser = argparse.ArgumentParser()
    parser.add_argument("--tag", type=str, default=None)
    parser.add_argument("--checkpoint", type=str, default=None)
    parser.add_argument("--conf", type=str, default=None)
    parser.add_argument("--overwrite", action="store_true")
    parser.add_argument("--overwrite_eval", action="store_true")
    parser.add_argument("--plot", action="store_true")
    parser.add_argument("dotlist", nargs="*")
    return parser


def load_model(model_conf, checkpoint, init_data=None):
    """Build (model, variables). With `checkpoint`, load a trained experiment;
    else build from conf — pretrained weights load through
    `conf.model.weights` (a converted-checkpoint msgpack path) if given.
    Returns (model, variables or None); variables None means the caller must
    init lazily with the first batch (reference `eval/io.py:88-98`)."""
    if checkpoint:
        from ..utils.experiments import load_experiment

        model, variables, _ = load_experiment(checkpoint, conf={"model": model_conf.to_dict() if isinstance(model_conf, Config) else model_conf})
        return model, variables
    model_conf = Config(model_conf)
    name = model_conf.get("name")
    model = get_model(name).from_conf(
        {k: v for k, v in model_conf.to_dict().items() if k != "name"}
    )
    variables = None
    weights = model_conf.get("weights_file")
    if weights:
        from flax import serialization

        with open(weights, "rb") as f:
            payload = serialization.msgpack_restore(f.read())
        variables = {"params": payload["params"]}
        if payload.get("batch_stats"):
            variables["batch_stats"] = payload["batch_stats"]
    return model, variables


def load_component_weights(model, variables: dict) -> dict:
    """Merge converted-weight msgpacks declared per pipeline component
    (`model.<comp>.weights_file`) into initialized variables."""
    from flax import serialization

    variables = {k: dict(v) if isinstance(v, dict) else v for k, v in variables.items()}
    for comp in getattr(model, "components", []):
        comp_conf = model.conf.get(comp)
        if not comp_conf or not comp_conf.get("name"):
            continue
        wf = comp_conf.get("weights_file")
        if not wf:
            continue
        with open(wf, "rb") as f:
            payload = serialization.msgpack_restore(f.read())
        key = f"{comp}_model"
        logger.info("Loading %s weights from %s", comp, wf)
        variables["params"] = dict(variables["params"])
        variables["params"][key] = serialization.from_state_dict(
            variables["params"][key], payload["params"]
        )
        if payload.get("batch_stats"):
            variables.setdefault("batch_stats", {})
            variables["batch_stats"] = dict(variables["batch_stats"])
            template = variables["batch_stats"].get(key, payload["batch_stats"])
            variables["batch_stats"][key] = serialization.from_state_dict(
                template, payload["batch_stats"]
            )
    return variables


def make_apply_fn(model, variables):
    """Return `apply(prepared_batch) -> pred` with lazy init and jit cache
    keyed by input shapes."""
    state = {"variables": variables}

    @jax.jit
    def _fwd(variables, batch):
        return model.apply(variables, batch, rngs={"sample": jax.random.key(0)})

    def apply_fn(batch):
        from ..train import strip_non_arrays

        batch = strip_non_arrays(batch)
        if state["variables"] is None:
            logger.info("Initializing model variables from the first batch")
            variables = dict(
                model.init(
                    {"params": jax.random.key(0), "sample": jax.random.key(1)}, batch
                )
            )
            state["variables"] = load_component_weights(model, variables)
        return _fwd(state["variables"], batch)

    return apply_fn

"""Config-surface tests: the shipped YAML recipes must launch real training
(scaled down to hermetic synthetic data) — the strongest proof that the
public config API works end to end."""

from pathlib import Path

import numpy as np
import pytest

CONFIG_DIR = Path(__file__).parent.parent / "gluefactory_tpu" / "configs"

TINY_DATA = {
    "data": {
        "data_dir": None,
        "synthetic_images": 12,
        "train_size": 4,
        "val_size": 2,
        "train_batch_size": 2,
        "val_batch_size": 2,
        "batch_size": 2,
        "num_workers": 0,
        "source_size": [160, 120],
        "homography": {"patch_shape": [160, 120], "difficulty": 0.5},
        "photometric": {"name": "identity", "p": 0.0},
    },
    "train": {"epochs": 1, "log_every_iter": 1, "eval_every_iter": 100},
}


def run_recipe(conf_name, extra):
    from gluefactory_tpu.core.config import Config, from_yaml, merge
    from gluefactory_tpu.train import default_conf, main_args, training

    conf = merge(Config(default_conf), from_yaml(str(CONFIG_DIR / conf_name)))
    conf = merge(conf, TINY_DATA)
    conf = merge(conf, extra)
    import tempfile

    with tempfile.TemporaryDirectory() as tmp:
        args = main_args([conf_name, "--no_tensorboard", "--max_val_iters", "1"])
        variables = training(conf, Path(tmp) / "exp", args)
    import jax

    for leaf in jax.tree.leaves(variables["params"]):
        assert np.isfinite(np.asarray(leaf)).all()


def test_superpoint_lightglue_homography_recipe():
    run_recipe(
        "superpoint+lightglue_homography.yaml",
        {
            "model": {
                "extractor": {"max_num_keypoints": 48},
                "matcher": {"n_layers": 2, "descriptor_dim": 64, "num_heads": 2,
                            "checkpointed": False},
            }
        },
    )


GLUESTICK_EXTRA = {
    "model": {
        "extractor": {
            "point_extractor": {"max_num_keypoints": 48},
            "max_num_lines": 12,
            "min_length": 10,
        },
        "matcher": {"n_layers": 2, "descriptor_dim": 64, "input_dim": 256,
                    "num_heads": 2, "checkpointed": False},
    }
}


import os


def test_gluestick_homography_recipe_precomputed_lines():
    """Default GlueStick launch path: the shipped recipe precomputes LSD
    lines + junctions in the data workers (data.detect_lines), so the jitted
    train step contains NO host callback — structurally flake-free."""
    extra = dict(GLUESTICK_EXTRA)
    extra["data"] = {
        "detect_lines": {
            "do": True, "max_num_lines": 12, "min_length": 10, "nms_radius": 3
        }
    }
    run_recipe("superpoint+lsd+gluestick-homography.yaml", extra)


@pytest.mark.skipif(
    not os.environ.get("RUN_FLAKY"),
    reason="LSD pure_callback inside the jitted train step has a rare C-level "
    "abort on the CPU test mesh (ROADMAP.md); training now defaults to "
    "precomputed lines (see test above) and the callback remains for "
    "single-shot inference only. Set RUN_FLAKY=1 to exercise it in training.",
)
def test_gluestick_homography_recipe_callback_lines():
    """Runs in a subprocess with one retry: an abort must fail THIS test,
    not kill the session."""
    import subprocess
    import sys

    extra = dict(GLUESTICK_EXTRA)
    extra["data"] = {"detect_lines": {"do": False}}  # force the callback path
    script = (
        "import jax; jax.config.update('jax_platforms', 'cpu'); "
        "import tests.test_config_recipes as m; "
        f"m.run_recipe('superpoint+lsd+gluestick-homography.yaml', {extra!r}); "
        "print('RECIPE_OK')"
    )
    import os

    env = dict(os.environ)
    env["XLA_FLAGS"] = (
        env.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=8"
    ).strip()
    last = None
    for _ in range(2):
        proc = subprocess.run(
            [sys.executable, "-c", script],
            capture_output=True, text=True, timeout=600, env=env,
            cwd=str(Path(__file__).parent.parent),
        )
        last = proc
        if proc.returncode == 0 and "RECIPE_OK" in proc.stdout:
            return
    raise AssertionError(
        f"gluestick recipe failed twice: rc={last.returncode}\n"
        f"stdout tail: {last.stdout[-2000:]}\nstderr tail: {last.stderr[-2000:]}"
    )

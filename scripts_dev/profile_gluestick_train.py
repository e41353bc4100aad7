"""GlueStick stage-1 training-step throughput on the v5e.

Completes the training perf story for the third flagship matcher
(LightGlue stage-1/stage-2 and this). Recipe shape
(configs/superpoint+lsd+gluestick-homography.yaml, reference trains
global batch 160): 640x480 patches, 1000 SuperPoint junctions (frozen),
250 precomputed LSD lines/view (data.detect_lines loader path — no host
callback in the step), GlueStick-9 with inter-layer supervision [2, 5],
point+line homography GT on-device, bf16.

Methodology: one REAL loader batch (host LSD precompute included in setup,
not in the timing — exactly the production split), device-put, k optimizer
steps chained in one jitted lax.scan (bench.py methodology).

Usage: python scripts_dev/profile_gluestick_train.py [B ...] (default 32 16 8)
"""

from __future__ import annotations

import json
import os
import sys
import time
from functools import partial

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

K_STEPS = int(os.environ.get("GS_STEPS", "5"))
N_KPTS = int(os.environ.get("GS_KPTS", "1000"))
N_LINES = int(os.environ.get("GS_LINES", "250"))
V5E_BF16_PEAK_FLOPS = 197e12  # keep in sync with bench.py / profile_matchers.py


def run(B: int):
    import jax
    import jax.numpy as jnp

    from gluefactory_tpu.core.config import Config
    from gluefactory_tpu.data import get_dataset
    from gluefactory_tpu.data.base_dataset import prepare_batch
    from gluefactory_tpu.models import get_model
    from gluefactory_tpu.train import (
        build_optimizer,
        default_train_conf,
        make_train_step,
        strip_non_arrays,
    )

    dataset = get_dataset("homographies")(
        {
            "data_dir": None,
            "synthetic_images": B,
            "train_size": B,
            "val_size": 0,
            "batch_size": B,
            "num_workers": 0,
            "source_size": [640, 480],
            "homography": {"patch_shape": [640, 480], "difficulty": 0.7, "max_angle": 45},
            "photometric": {"name": "identity", "p": 0.0},
            "detect_lines": {
                "do": True,
                "max_num_lines": N_LINES,
                "min_length": 15,
                "nms_radius": 4,
            },
        }
    )
    loader = dataset.get_data_loader("train", shuffle=False)
    batch = jax.device_put(strip_non_arrays(prepare_batch(next(iter(loader)))))

    model = get_model("two_view_pipeline").from_conf(
        {
            "extractor": {
                "name": "wireframe",
                "trainable": False,
                "point_extractor": {
                    "name": "superpoint",
                    "trainable": False,
                    "dense_outputs": True,
                    "max_num_keypoints": N_KPTS,
                    "force_num_keypoints": True,
                    "detection_threshold": 0.0,
                },
                "max_num_lines": N_LINES,
                "min_length": 15,
                "nms_radius": 4,
            },
            "matcher": {
                "name": "gluestick",
                "input_dim": 256,
                "descriptor_dim": 256,
                "inter_supervision": [2, 5],
                "checkpointed": True,
            },
            "ground_truth": {
                "name": "homography_matcher",
                "trainable": False,
                "use_points": True,
                "use_lines": True,
                "th_positive": 3,
                "th_negative": 5,
            },
        }
    )
    batch1 = jax.tree.map(
        lambda x: x[:1] if hasattr(x, "shape") and getattr(x, "ndim", 0) > 0 else x,
        batch,
    )
    variables = dict(
        model.init(
            {"params": jax.random.key(0), "sample": jax.random.key(1)},
            batch1,
            method="initialize",
        )
    )
    tx, _ = build_optimizer(Config(default_train_conf), variables["params"], model, 1000)
    opt_state = tx.init(variables["params"])
    base_step = make_train_step(model, tx, "bf16")

    @partial(jax.jit, static_argnames=("k",))
    def multi(variables, opt_state, batch, rng, k):
        def body(carry, rng_i):
            variables, opt_state = carry
            variables, opt_state, losses, metrics, info = base_step(
                variables, opt_state, batch, rng_i
            )
            return (variables, opt_state), losses["total"].mean()

        (variables, opt_state), totals = jax.lax.scan(
            body, (variables, opt_state), jax.random.split(rng, k)
        )
        return totals

    compiled = multi.lower(
        variables, opt_state, batch, jax.random.key(2), k=K_STEPS
    ).compile()
    flops = mem = None
    try:
        ca = compiled.cost_analysis()
        if isinstance(ca, (list, tuple)):
            ca = ca[0]
        flops = (float(ca.get("flops", 0.0)) * K_STEPS) or None
    except Exception:
        pass
    try:
        ma = compiled.memory_analysis()
        mem = round(
            (ma.temp_size_in_bytes + ma.argument_size_in_bytes + ma.output_size_in_bytes)
            / 2**30,
            2,
        )
    except Exception:
        pass

    totals = np.asarray(compiled(variables, opt_state, batch, jax.random.key(2)))
    assert np.isfinite(totals).all(), totals
    t0 = time.perf_counter()
    totals = np.asarray(compiled(variables, opt_state, batch, jax.random.key(3)))
    dt = time.perf_counter() - t0
    out = {
        "metric": (
            f"GlueStick stage-1 train step (SP frozen {N_KPTS}junc, "
            f"{N_LINES} precomputed lines, GS-9 remat, pt+line H-GT, bf16, "
            f"640x480, B={B})"
        ),
        "ms_per_step": round(dt / K_STEPS * 1000, 1),
        "pairs_per_sec": round(B / (dt / K_STEPS), 2),
        "loss_last": round(float(totals[-1]), 4),
        "steps_chained": K_STEPS,
    }
    if flops:
        out["train_gflops_per_pair"] = round(flops / (K_STEPS * B) / 1e9, 1)
        out["mfu"] = round(flops / dt / V5E_BF16_PEAK_FLOPS, 4)
    if mem is not None:
        out["xla_memory_gib"] = mem
    print(json.dumps(out), flush=True)
    return True


if __name__ == "__main__":
    sizes = [int(a) for a in sys.argv[1:]] or [32, 16, 8]
    for B in sizes:
        try:
            if run(B):
                break
        except Exception as e:
            msg = str(e)
            print(
                json.dumps(
                    {"metric": f"gluestick train step B={B}", "error": msg[:300]}
                ),
                flush=True,
            )

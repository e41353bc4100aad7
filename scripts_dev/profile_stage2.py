"""Stage-2 MegaDepth fine-tune train-step feasibility + throughput on the
v5e (VERDICT r4 next #5).

Recipe shape (configs/superpoint+lightglue_megadepth.yaml, reference
README.md:246-286 — trained there on 2x RTX 3090): 1024x1024 square-padded
RGB pairs, 2048 keypoints (frozen SuperPoint), LightGlue-9 with remat
(`checkpointed: True`) + flash attention, depth_matcher GT on-device,
bf16 mixed precision, target per-chip batch 32.

Methodology: ONE fabricated batch (geometry-consistent flat scene so the
depth GT labels are meaningful), k optimizer steps chained inside one jitted
lax.scan reusing that batch (params advance every step, so XLA cannot dedupe
the bodies; one tunnel round-trip per measurement — bench.py methodology).
On RESOURCE_EXHAUSTED the batch is halved so the largest feasible per-chip
batch is reported alongside the target.

Usage: python scripts_dev/profile_stage2.py [B ...]   (default: 32 16 8)
Prints one JSON line per configuration.
"""

from __future__ import annotations

import json
import os
import sys
import time
from functools import partial

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

K_STEPS = int(os.environ.get("STAGE2_STEPS", "5"))
SIZE = int(os.environ.get("STAGE2_SIZE", "1024"))
KPTS = int(os.environ.get("STAGE2_KPTS", "2048"))
# gradient accumulation (optax.MultiSteps): effective batch = ACCUM * B
ACCUM = int(os.environ.get("STAGE2_ACCUM", "1"))
# decomposition knobs: GT=homography swaps the depth GT for the (cheap)
# homography GT; FWD_ONLY=1 times forward+GT+loss without grads/update
GT = os.environ.get("STAGE2_GT", "depth")
REMAT = os.environ.get("STAGE2_REMAT", "1") == "1"
FWD_ONLY = os.environ.get("STAGE2_FWD_ONLY", "0") == "1"


def make_batch(B: int):
    """Geometry-consistent fabricated stage-2 batch: flat scene at depth 5,
    translation-only relative pose, square 1024x1024 RGB + depth."""
    import jax.numpy as jnp

    from gluefactory_tpu.data.base_dataset import collate, prepare_batch
    from gluefactory_tpu.train import strip_non_arrays

    rng = np.random.default_rng(0)
    items = []
    for b in range(B):
        item = {}
        for i in (0, 1):
            K = np.array(
                [[1200.0, 0, SIZE / 2 + 3.0], [0, 1180.0, SIZE / 2 - 2.0], [0, 0, 1]],
                np.float32,
            )
            item[f"view{i}"] = {
                "image": rng.uniform(0, 1, (SIZE, SIZE, 3)).astype(np.float32),
                "image_size": np.array([SIZE, SIZE], np.float32),
                "depth": np.full((SIZE, SIZE), 5.0, np.float32),
                "camera": {
                    "size": np.array([SIZE, SIZE], np.float32),
                    "f": np.array([K[0, 0], K[1, 1]], np.float32),
                    "c": np.array([K[0, 2], K[1, 2]], np.float32),
                    "dist": np.zeros(0, np.float32),
                },
                "T_w2cam": np.eye(4, dtype=np.float32),
            }
        T = np.eye(4, dtype=np.float32)
        T[0, 3] = 0.4 + 0.01 * b
        item["T_0to1"] = T
        item["H_0to1"] = np.eye(3, dtype=np.float32)
        items.append(item)
    return strip_non_arrays(prepare_batch(collate(items)))


def run(B: int):
    import jax
    import jax.numpy as jnp

    from gluefactory_tpu.core.config import Config
    from gluefactory_tpu.models import get_model
    from gluefactory_tpu.train import (
        build_optimizer,
        default_train_conf,
        make_train_step,
    )

    model = get_model("two_view_pipeline").from_conf(
        {
            "extractor": {
                "name": "superpoint",
                "max_num_keypoints": KPTS,
                "force_num_keypoints": True,
                "detection_threshold": 0.0,
                "nms_radius": 3,
                "trainable": False,
            },
            "matcher": {
                "name": "lightglue",
                "filter_threshold": 0.1,
                "flash": True,
                "checkpointed": REMAT,
            },
            "ground_truth": (
                {
                    "name": "depth_matcher",
                    "th_positive": 3,
                    "th_negative": 5,
                    "th_epi": 5,
                }
                if GT == "depth"
                else {"name": "homography_matcher", "th_positive": 3}
            ),
            "allow_no_extract": True,
        }
    )
    batch = jax.device_put(make_batch(B))  # device-resident: the timed
    # calls must not re-pay the ~270 MB host->device relay transfer each
    # dispatch (that cost is real for relay training but is reported by
    # the transfer-inclusive number, not folded into compute ms/step)
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
    train_conf = Config(dict(default_train_conf, grad_accumulation=ACCUM))
    tx, _ = build_optimizer(train_conf, variables["params"], model, 1000)
    opt_state = tx.init(variables["params"])
    base_step = make_train_step(model, tx, "bf16")
    if FWD_ONLY:
        from gluefactory_tpu.train import make_eval_step

        ev = make_eval_step(model)

        def base_step(variables, opt_state, batch, rng):  # noqa: F811
            b = dict(batch)
            for view in ("view0", "view1"):
                b[view] = dict(b[view])
                b[view]["image"] = b[view]["image"].astype(jnp.bfloat16)
            losses, metrics, _ = ev(
                {
                    "params": jax.tree.map(
                        lambda x: x.astype(jnp.bfloat16)
                        if isinstance(x, jnp.ndarray) and x.dtype == jnp.float32
                        else x,
                        variables["params"],
                    )
                },
                b,
                rng,
            )
            return variables, opt_state, {"total": losses["total"]}, metrics, {}

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
    flops = None
    try:
        ca = compiled.cost_analysis()
        if isinstance(ca, (list, tuple)):
            ca = ca[0]
        flops = (float(ca.get("flops", 0.0)) * K_STEPS) or None
    except Exception:
        pass
    mem = None
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
    ms_per_step = dt / K_STEPS * 1000
    out = {
        "metric": (
            f"stage-2 MegaDepth {'fwd-only' if FWD_ONLY else 'train'} step "
            f"(GT={GT}, SP frozen {KPTS}kpts, LG-9 "
            f"{'remat' if REMAT else 'NO-remat'} flash, bf16, {SIZE}px, B={B}"
            + (f", grad_accum={ACCUM} -> eff B={ACCUM * B}" if ACCUM > 1 else "")
            + ")"
        ),
        "ms_per_step": round(ms_per_step, 1),
        "pairs_per_sec": round(B / (dt / K_STEPS), 2),
        "loss_last": round(float(totals[-1]), 4),
        "steps_chained": K_STEPS,
    }
    if flops:
        out["train_gflops_per_pair"] = round(flops / (K_STEPS * B) / 1e9, 1)
        out["mfu"] = round(flops / dt / 197e12, 4)
    if mem is not None:
        out["xla_memory_gib"] = mem
    print(json.dumps(out), flush=True)
    return True


if __name__ == "__main__":
    sizes = [int(a) for a in sys.argv[1:]] or [32, 16, 8]
    for B in sizes:
        try:
            if run(B):
                break  # largest requested batch fits: done
        except Exception as e:
            msg = str(e)
            print(
                json.dumps(
                    {
                        "metric": f"stage-2 train step B={B}",
                        "error": msg[:400],
                        "oom": "RESOURCE_EXHAUSTED" in msg,
                    }
                ),
                flush=True,
            )
